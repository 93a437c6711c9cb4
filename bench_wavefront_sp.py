"""Cross-chip wavefront (parallel/wavefront_sp) benchmark.

Two honest numbers (BASELINE.md weak-scaling north star; VERDICT r2 #8):

* ``tpu``: the per-device pallas block engine driven through the REAL
  jitted shard_map pipeline on a 1-device TPU mesh — the hardware rate
  of the exact program multi-chip pods would run (only the ppermute hop
  count changes with n).  Multi-chip hardware is not available in this
  environment; the 8-device dryrun (__graft_entry__.dryrun_multichip)
  validates the sharded program itself.
* ``cpu-virtual``: the same pipeline on an 8-virtual-device CPU mesh vs
  a 1-device mesh (lax block engine).  Virtual devices share one host's
  cores, so this is a *pipeline-overhead* check, not a scaling claim;
  the analytic pipeline efficiency J/(J+n-1) is printed alongside.

Usage: python bench_wavefront_sp.py [--platform cpu]
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import subprocess
import sys
import time


def run_tpu():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from aligner_tpu.backend import on_tpu
    from aligner_tpu.matrices import blosum62
    from aligner_tpu.parallel.wavefront_sp import sharded_global_end_score

    assert on_tpu(), "tpu mode requires the TPU backend"
    rng = np.random.default_rng(7)
    M = np.asarray(blosum62())
    L = 65536
    q = rng.integers(0, 24, L).astype(np.int32)
    t = rng.integers(0, 24, L).astype(np.int32)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("data",))

    tr = 128
    end = sharded_global_end_score(mesh, q, t, M, 11.0, 2.0, tr=tr,
                                   engine="pallas")  # compile + warm
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        end = sharded_global_end_score(mesh, q, t, M, 11.0, 2.0, tr=tr,
                                       engine="pallas")
    dt = (time.time() - t0) / reps
    gcups = L * L / dt / 1e9
    print(json.dumps({
        "bench": "wavefront_sp_pallas_shard_map_1chip",
        "pair": f"{L}x{L}", "end": end,
        "gcups": round(gcups, 2),
        "note": "exact global end score, jitted shard_map pipeline, tr=128",
    }))


def run_cpu_virtual():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from aligner_tpu.matrices import blosum62
    from aligner_tpu.parallel.wavefront_sp import sharded_global_end_score

    rng = np.random.default_rng(7)
    M = np.asarray(blosum62())
    L = 4096
    q = rng.integers(0, 24, L).astype(np.int32)
    t = rng.integers(0, 24, L).astype(np.int32)
    tr = 128
    J = L // tr
    out = {}
    for n in (1, 8):
        mesh = Mesh(np.array(jax.devices()[:n]).reshape(n), ("data",))
        end = sharded_global_end_score(mesh, q, t, M, 11.0, 2.0, tr=tr,
                                       engine="lax")
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            end = sharded_global_end_score(mesh, q, t, M, 11.0, 2.0, tr=tr,
                                           engine="lax")
        dt = (time.time() - t0) / reps
        out[n] = dt
        print(json.dumps({
            "bench": "wavefront_sp_lax_virtual_mesh", "devices": n,
            "pair": f"{L}x{L}", "end": end,
            "gcups": round(L * L / dt / 1e9, 3),
        }))
    print(json.dumps({
        "bench": "wavefront_sp_pipeline_model",
        "analytic_efficiency_J_over_J_plus_n_minus_1": round(J / (J + 8 - 1), 3),
        "virtual_mesh_t1_over_t8": round(out[1] / out[8], 3),
        "note": "virtual devices share one host CPU; not a scaling claim",
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform == "cpu":
        os.environ["ALIGNER_PLATFORM"] = "cpu"
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        run_cpu_virtual()
        return
    run_tpu()
    # the virtual-mesh leg needs a CPU-platform process
    subprocess.run([sys.executable, __file__, "--platform", "cpu"],
                   check=False)


if __name__ == "__main__":
    main()
