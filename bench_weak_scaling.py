"""Weak-scaling harness for the cross-chip wavefront pipeline.

Ready-to-run for the day a multi-chip pod is reachable (VERDICT r3 #5):
sweeps mesh sizes n over the available devices at CONSTANT per-device
load (C = n·cb columns, R rows fixed), measures the jitted shard_map
pipeline wall time per n, and prints measured GCUPS/chip, weak-scaling
efficiency vs n=1, and the analytic model's prediction
(``wavefront_sp.auto_shard_config``) side by side.

On this machine (one real chip) only n=1 runs on hardware; pass
``--platform cpu`` for an 8-virtual-device functional sweep (tiny
shapes, lax engine — validates the sweep mechanics and the analytic
numbers, NOT a hardware scaling claim; virtual devices share host
cores, see BASELINE.md).

Usage:
  python bench_weak_scaling.py [--cb 65536] [--rows 1048576]
  python bench_weak_scaling.py --platform cpu   # virtual-mesh dry run
"""

import argparse
import json
import os
import time


def sweep(cb: int, rows: int, engine=None, tr=None, reps: int = 3,
          max_n: int | None = None):
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from aligner_tpu.matrices import blosum62
    from aligner_tpu.parallel.wavefront_sp import (
        auto_shard_config,
        sharded_global_end_score,
    )

    rng = np.random.default_rng(11)
    M = np.asarray(blosum62())
    devs = jax.devices()
    n_avail = len(devs) if max_n is None else min(max_n, len(devs))
    t = rng.integers(0, 24, rows).astype(np.int32)
    base_gcups = None
    n = 1
    while n <= n_avail:
        C = n * cb
        q = rng.integers(0, 24, C).astype(np.int32)
        mesh = Mesh(np.array(devs[:n]).reshape(n), ("data",))
        kw = {}
        if engine is not None:
            kw["engine"] = engine
        if tr is not None:
            kw["tr"] = tr
        end = sharded_global_end_score(mesh, q, t, M, 11.0, 2.0, **kw)
        t0 = time.time()
        for _ in range(reps):
            end = sharded_global_end_score(mesh, q, t, M, 11.0, 2.0, **kw)
        dt = (time.time() - t0) / reps
        gcups = C * rows / dt / 1e9
        per_chip = gcups / n
        if base_gcups is None:
            base_gcups = per_chip
        eng_m, tr_m, model = auto_shard_config(C, rows, n)
        print(json.dumps({
            "bench": "wavefront_sp_weak_scaling",
            "n": n, "pair": f"{C}x{rows}", "end": end,
            "gcups_total": round(gcups, 2),
            "gcups_per_chip": round(per_chip, 2),
            "efficiency_vs_n1": round(per_chip / base_gcups, 3),
            "model_engine": eng_m, "model_tr": tr_m,
            "model_gcups_per_chip": round(model, 1),
            "model_efficiency": round(
                model / auto_shard_config(cb, rows, 1)[2], 3
            ),
        }))
        n *= 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cb", type=int, default=65536,
                    help="per-device column-block width (constant load)")
    ap.add_argument("--rows", type=int, default=1048576)
    ap.add_argument("--engine", default=None)
    ap.add_argument("--tr", type=int, default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--max-n", type=int, default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform == "cpu":
        os.environ["ALIGNER_PLATFORM"] = "cpu"
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        # tiny functional sweep: virtual devices share host cores, so
        # wall times are NOT a scaling claim (the model columns are the
        # meaningful output here)
        sweep(cb=512, rows=2048, engine="lax", tr=128,
              reps=args.reps, max_n=args.max_n)
        return
    sweep(cb=args.cb, rows=args.rows, engine=args.engine, tr=args.tr,
          reps=args.reps, max_n=args.max_n)


if __name__ == "__main__":
    main()
