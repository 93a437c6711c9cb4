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


def _marginal_pipeline(mesh, q, t, M, tr, engine, K=4):
    """K-loop marginal GCUPS of the jitted shard_map pipeline: chain K
    data-dependent pipeline calls inside one jit so the per-dispatch
    tunnel RTT divides out (docs/PERF_NOTES.md methodology)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from aligner_tpu.parallel.wavefront_sp import (
        _build_pipeline,
        _prep_sharded,
    )

    pp = _prep_sharded(mesh, q, t, M, 11.0, 2.0, tr, None, engine, False)
    run = _build_pipeline(
        mesh, pp["axis"], pp["n"], pp["engine"], pp["interpret"],
        pp["V"], pp["Cb"], pp["S_loc"], pp["J"], pp["R_pad"],
        int(pp["DEL"]), int(pp["EXT"]), pp["stride"], pp["n_ck"],
        pp["tr"], False, pp["lut_bits"], pp["bias2"],
    )
    lens = jnp.asarray([pp["C_real"], pp["R_real"]], jnp.int32)
    qp = jnp.asarray(pp["qp"])
    mi = pp["mi"]

    def chain(k):
        @jax.jit
        def g(tp):
            def body(c, _):
                e = run(qp, c, mi, lens)
                return c + (e - e).astype(c.dtype), e

            _, es = lax.scan(body, tp, None, length=k)
            return es

        return g

    g1, gk = chain(1), chain(K)
    tp = jnp.asarray(pp["tp"])
    e1 = g1(tp)
    ek = gk(tp)
    assert np.asarray(e1)[0] == np.asarray(ek)[-1]
    end = float(np.asarray(e1)[0])
    cells = len(q) * len(t)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        g1(tp).block_until_ready()
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        gk(tp).block_until_ready()
        t3 = time.perf_counter()
        best = max(best, cells / (((t3 - t2) - (t1 - t0)) / (K - 1)) / 1e9)
    return best, end, pp["tr"]


def run_tpu(band_trs=(2048, 4096, 8192, 16384)):
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

    # the no-args default (auto_shard_config → band at the modeled tr)
    end_a = sharded_global_end_score(mesh, q, t, M, 11.0, 2.0)
    assert end_a == end
    t0 = time.time()
    for _ in range(reps):
        sharded_global_end_score(mesh, q, t, M, 11.0, 2.0)
    dt = (time.time() - t0) / reps
    print(json.dumps({
        "bench": "wavefront_sp_auto_config_1chip",
        "pair": f"{L}x{L}", "end": end_a,
        "gcups": round(L * L / dt / 1e9, 2),
        "note": "same pipeline through the auto-config default "
                "(engine/tr from the measured model), incl. RTT",
    }))

    # K-loop marginals of the per-device block engines (VERDICT r3 #1):
    # the round-3 row-scan config (tr=128) vs the band-diagonal block
    # engine across band heights.  End scores cross-checked equal.
    g, ref_end, _ = _marginal_pipeline(mesh, q, t, M, 128, "pallas")
    print(json.dumps({
        "bench": "wavefront_sp_block_engine_marginal", "engine": "pallas",
        "tr": 128, "pair": f"{L}x{L}",
        "gcups_marginal": round(g, 1), "end": ref_end,
    }))
    for tr_b in band_trs:
        g, e, tr_eff = _marginal_pipeline(mesh, q, t, M, tr_b, "band")
        assert e == ref_end, (e, ref_end)
        print(json.dumps({
            "bench": "wavefront_sp_block_engine_marginal",
            "engine": "band", "tr": tr_eff, "pair": f"{L}x{L}",
            "gcups_marginal": round(g, 1), "end": e,
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
