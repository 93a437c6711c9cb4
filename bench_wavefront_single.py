"""Single-pair global wavefront engines benchmark (BENCH_modes.json rows).

Measures the two single-pair engines at 64k x 64k with the K-loop
marginal method (chain K data-dependent calls inside one jit; rate =
cells / ((t_K - t_1) / (K - 1)) — kernel-side throughput with the
per-dispatch tunnel RTT excluded, docs/PERF_NOTES.md):

* row-scan engine (``fill_single_global``, scores-only) — the
  alignment-capable engine, ~45.6 GCUPS;
* band-diagonal engine (``end_score_single_global_diag``) — scan-free,
  scores-only, ~67.7 GCUPS at TB=16384.

Usage: python bench_wavefront_single.py [--size 65536]
Prints one JSON line per engine.
"""

import argparse
import json
import time

import numpy as np


def _chain(call, K):
    import jax
    from jax import lax

    @jax.jit
    def g(x):
        def body(c, _):
            e = call(c)
            return c + (e - e).astype(c.dtype), e

        _, es = lax.scan(body, x, None, length=K)
        return es

    return g


def _marginal(g1, gk, x, K, cells, trials=3):
    g1(x).block_until_ready()
    gk(x).block_until_ready()
    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        g1(x).block_until_ready()
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        gk(x).block_until_ready()
        t3 = time.perf_counter()
        best = max(best, cells / (((t3 - t2) - (t1 - t0)) / (K - 1)) / 1e9)
    return best


def bench_rowscan(q, t, M, K=5):
    from aligner_tpu.ops import wavefront as wf

    pp = wf._prep(q, t, M, 11.0, 2.0)
    S, tr = pp["S"], 64
    R = pp["R_real"]
    R_pad = (R + tr - 1) // tr * tr
    tp = np.zeros(R_pad, np.int32)
    tp[:R] = pp["t"]
    import jax.numpy as jnp

    t_rows = jnp.asarray(tp.reshape(R_pad // tr, 1, tr))
    q_tile, pmat = pp["q_tile"], pp["pmat"]

    def call(qt):
        outs = wf._run(
            qt, t_rows, pmat, jnp.zeros((S, wf.LANES), jnp.int32),
            S=S, TR=tr, V=pp["V"], C_real=pp["C_real"], R_real=R,
            del_=11, ext=2, with_dirs=False, interpret=False,
        )
        return outs[0][0, 0]

    g1, gk = _chain(call, 1), _chain(call, K)
    return _marginal(g1, gk, q_tile, K, len(q) * len(t))


def bench_diag(q, t, M, K=5, TB=16384, td=512):
    import jax.numpy as jnp

    from aligner_tpu.ops import wavefront as wf

    pp = wf._prep(q, t, M, 11.0, 2.0)
    R, C = pp["R_real"], pp["C_real"]
    S = TB // wf.LANES
    pmat, bias = wf.pack_matrix_nibbles(np.asarray(M).T)
    n_bands = (R + TB - 1) // TB
    tp = np.zeros(n_bands * TB, np.int32)
    tp[:R] = pp["t"]
    Cb = pp["C_pad"]
    D_pad = (Cb + TB - 1 + td - 1) // td * td
    qs = np.full(D_pad, pp["V"], np.int32)
    qs[:C] = pp["q"]
    qc = jnp.asarray(qs.reshape(D_pad // td, 1, td))
    pm = jnp.asarray(pmat)
    lens = jnp.asarray([C, R], jnp.int32)
    tb_a = jnp.asarray(tp.reshape(n_bands, S, wf.LANES))

    def call(tb):
        return wf._run_band(
            tb, qc, pm, lens,
            S=S, TD=td, V=pp["V"], Cb=Cb,
            del_=11, ext=2, lut_bits=4, bias2=bias + 2 * 2,
            interpret=False,
        )

    g1, gk = _chain(call, 1), _chain(call, K)
    return _marginal(g1, gk, tb_a, K, len(q) * len(t))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=65536)
    args = ap.parse_args()
    from aligner_tpu.backend import on_tpu
    from aligner_tpu.matrices import blosum62

    assert on_tpu(), "this benchmark needs the TPU backend"
    rng = np.random.default_rng(1)
    M = np.asarray(blosum62())
    L = args.size
    q = rng.integers(0, 24, L).astype(np.int32)
    t = rng.integers(0, 24, L).astype(np.int32)
    print(json.dumps({
        "bench": "wavefront_single_pair_rowscan_scores_only",
        "pair": f"{L}x{L}",
        "gcups_marginal": round(bench_rowscan(q, t, M), 1),
    }))
    print(json.dumps({
        "bench": "wavefront_single_pair_diag_band_scores_only",
        "pair": f"{L}x{L}",
        "gcups_marginal": round(bench_diag(q, t, M), 1),
    }))


if __name__ == "__main__":
    main()
