"""Kernel-side mode matrix for the batched DP fill (BENCH_modes rows).

K-loop marginal GCUPS (chain K data-dependent launches inside one jit;
rate = cells / ((t_K - t_1)/(K-1)) — tunnel RTT excluded) for every
kernel config a production consumer actually runs:

* pair scores-only, dense, no argmax   — the p-value workload
  (statistics.py:240, track_argmax=False)
* pair argmax-on                        — local_max_score consumers
* pair full mode (2-bit packed dirs)    — the heuristic loop / batch
  alignments (heuristic.py with_alignments=True)
* PWM scores-only, shared f32 PWM       — window-scan z-filter
* PWM full mode, shared f32 PWM         — the latent-repeat-search hot
  loop (engine/calc.rs:45-75 equivalent; repeat/engine.py:179) at the
  reference's shapes (window = 330, W = 300)

Usage: python bench_kernel_modes.py [--batch 32768] [--k 8]
Prints one JSON line per config.
"""

import argparse
import json
import time

import numpy as np


def _marginal(call, x, K, cells, trials=3):
    import jax
    from jax import lax

    def chain(k):
        @jax.jit
        def g(t4):
            def body(c, _):
                out = call(c)[0, 0, 0]
                return c + (out - out).astype(c.dtype), out

            _, os_ = lax.scan(body, t4, None, length=k)
            return os_

        return g

    g1, gk = chain(1), chain(K)
    g1(x).block_until_ready()
    gk(x).block_until_ready()
    # median of per-trial rates, not best-of: best-of amplifies jitter
    # on short runs (a slow t(K=1) sample shrinks the delta and inflates
    # the rate — observed as a 27% outlier on the fastest config)
    rates = []
    for _ in range(max(trials, 3)):
        t0 = time.perf_counter()
        g1(x).block_until_ready()
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        gk(x).block_until_ready()
        t3 = time.perf_counter()
        rates.append(cells / (((t3 - t2) - (t1 - t0)) / (K - 1)) / 1e9)
    rates.sort()
    return rates[len(rates) // 2]


def bench_pair(B, K):
    import jax.numpy as jnp

    from aligner_tpu.matrices import blosum62
    from aligner_tpu.ops import pallas_dp as P

    rng = np.random.default_rng(3)
    M = np.asarray(blosum62())
    L = 400
    q = rng.integers(0, 24, (B, L)).astype(np.int32)
    t = rng.integers(0, 24, (B, L)).astype(np.int32)
    ql = np.full(B, L, np.int32)
    tl = np.full(B, L, np.int32)
    _, lut_bits, lut_bias = P.lut_params(M)
    m4 = jnp.asarray(np.round(M).astype(np.int32))
    cells = B * L * L

    def cfg(name, with_planes, dense, track_argmax, bs=None):
        BS = bs or min(
            P._pick_bs(L, L, 24, with_planes, False, scores_plane=False),
            max(1, P._cdiv(B, P.LANES)),
        )
        NB = P._cdiv(B, BS * P.LANES)
        q4 = jnp.asarray(P._seq_operand(P._to_tiles(q, NB, BS, (L,))))
        t4 = jnp.asarray(P._seq_operand(P._to_tiles(t, NB, BS, (L,))))
        ql4 = jnp.asarray(P._to_tiles(ql, NB, BS, ()))
        tl4 = jnp.asarray(P._to_tiles(tl, NB, BS, ()))

        def call(t4c):
            out = P._run(
                q4, t4c, ql4, tl4, m4,
                11.0, 2.0,
                mode="local", with_planes=with_planes, dtype=jnp.float32,
                interpret=False, packed_lut=True, lut_bits=lut_bits,
                lut_bias=lut_bias, dense=dense,
                track_argmax=track_argmax, with_scores_plane=False,
            )
            return out[0]

        g = _marginal(call, t4, K, cells)
        print(json.dumps({
            "bench": f"pair_{name}", "B": B, "L": L, "BS": BS,
            "gcups_marginal": round(g, 1),
        }))

    cfg("scores_only_dense", False, True, False)
    cfg("argmax_on", False, True, True)
    cfg("full_mode_packed_dirs", True, True, True)

    # the REAL p-value shape mix (VERDICT r3 #6b): calculate_p_value's
    # shuffles drop a random 0..6-char tail (statistics/mod.rs:309-320;
    # statistics.py:193-199), so the production path runs the masked
    # (non-dense) kernel with tlen in [L-6, L]
    tl_mix = rng.integers(L - 6, L + 1, B).astype(np.int32)
    BSm = min(
        P._pick_bs(L, L, 24, False, False, scores_plane=False),
        max(1, P._cdiv(B, P.LANES)),
    )
    NBm = P._cdiv(B, BSm * P.LANES)
    q4m = jnp.asarray(P._seq_operand(P._to_tiles(q, NBm, BSm, (L,))))
    t4m = jnp.asarray(P._seq_operand(P._to_tiles(t, NBm, BSm, (L,))))
    ql4m = jnp.asarray(P._to_tiles(ql, NBm, BSm, ()))
    tl4m = jnp.asarray(P._to_tiles(tl_mix, NBm, BSm, ()))

    def call_masked(t4c):
        out = P._run(
            q4m, t4c, ql4m, tl4m, m4, 11.0, 2.0,
            mode="local", with_planes=False, dtype=jnp.float32,
            interpret=False, packed_lut=True, lut_bits=lut_bits,
            lut_bias=lut_bias, dense=False,
            track_argmax=False, with_scores_plane=False,
        )
        return out[0]

    cells_m = int(tl_mix.astype(np.int64).sum()) * L
    g = _marginal(call_masked, t4m, K, cells_m)
    print(json.dumps({
        "bench": "pair_scores_only_masked_pvalue_mix", "B": B, "L": L,
        "BS": BSm, "tlen": "L-6..L",
        "gcups_marginal": round(g, 1),
    }))


def bench_pwm(B, K, W=300, R=330):
    import jax.numpy as jnp

    from aligner_tpu.matrices import transform_matrix
    from aligner_tpu.ops import pallas_dp as P

    rng = np.random.default_rng(5)
    # a REAL transformed PWM: float64 post-transform_matrix values, the
    # repeat-search matrix family (kd=0, r2=del*ext — engine defaults)
    raw = rng.integers(-1, 2, (4, W)).astype(np.float64)
    freqs = np.full(4, 0.25)
    pwm = np.asarray(transform_matrix(raw, 0.0, 30.0 * 7.0, freqs))
    q = rng.integers(0, 4, (B, R)).astype(np.int32)
    ql = np.full(B, R, np.int32)
    Rp = (R + 7) // 8 * 8
    qp = np.pad(q, ((0, 0), (0, Rp - R)))
    cells = B * R * W

    def cfg(name, with_planes, track_argmax=True):
        BS = min(
            P._pick_bs(Rp, W, 4, with_planes, False, scores_plane=False,
                       mat_rows=4 * W),
            max(1, P._cdiv(B, P.LANES)),
        )
        NB = P._cdiv(B, BS * P.LANES)
        t4 = jnp.asarray(P._seq_operand(P._to_tiles(qp, NB, BS, (Rp,))))
        tl4 = jnp.asarray(P._to_tiles(ql, NB, BS, ()))
        m4 = jnp.asarray(pwm, jnp.float32)

        def call(t4c):
            out = P._run(
                None, t4c, None, tl4, m4,
                30.0, 7.0,
                mode="pwm", with_planes=with_planes, dtype=jnp.float32,
                interpret=False, with_scores_plane=False,
                track_argmax=track_argmax,
            )
            return out[0]

        g = _marginal(call, t4, K, cells)
        print(json.dumps({
            "bench": f"pwm_{name}", "B": B, "W": W, "window": R, "BS": BS,
            "gcups_marginal": round(g, 1),
        }))

    cfg("scores_only", False)
    cfg("scores_only_no_argmax", False, track_argmax=False)
    cfg("full_mode_packed_dirs", True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--pwm-batch", type=int, default=16384)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()
    from aligner_tpu.backend import on_tpu

    assert on_tpu(), "this benchmark needs the TPU backend"
    bench_pair(args.batch, args.k)
    bench_pwm(args.pwm_batch, args.k)


if __name__ == "__main__":
    main()
