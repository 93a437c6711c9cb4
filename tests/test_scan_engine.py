"""Plane-level parity of the batched XLA scan engine vs the scalar oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from aligner_tpu import oracle
from aligner_tpu.matrices import blosum62, random_pwm, transform_matrix
from aligner_tpu.ops import fill_batch, fill_pwm_batch


def _random_batch(rng, B, Cmax, Rmax, vol=24):
    qs = np.zeros((B, Cmax), np.int32)
    ts = np.zeros((B, Rmax), np.int32)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for b in range(B):
        ql[b] = rng.integers(1, Cmax + 1)
        tl[b] = rng.integers(1, Rmax + 1)
        qs[b, : ql[b]] = rng.integers(0, vol, ql[b])
        ts[b, : tl[b]] = rng.integers(0, vol, tl[b])
    return qs, ql, ts, tl


@pytest.mark.parametrize("mode", ["local", "global"])
def test_planes_match_oracle(rng, mode):
    M = blosum62()
    q, ql, t, tl = _random_batch(rng, 12, 16, 16)
    r = fill_batch(q, ql, t, tl, M, 11.0, 2.0, mode=mode, dtype=jnp.float64)
    plane, dirs = np.asarray(r.plane), np.asarray(r.dirs)
    fn = oracle.fill_local if mode == "local" else oracle.fill_global
    for b in range(12):
        a_o, d_o = fn(q[b, : ql[b]], t[b, : tl[b]], M, 11.0, 2.0)
        assert np.array_equal(a_o, plane[b, : tl[b] + 1, : ql[b] + 1])
        assert np.array_equal(d_o, dirs[b, : tl[b] + 1, : ql[b] + 1])
        if mode == "local":
            my, mx = oracle.argmax_first_rowmajor(a_o)
            assert (int(r.fy[b]), int(r.fx[b])) == (my, mx)
            assert float(r.fmax[b]) == a_o.max()
        assert float(r.end[b]) == a_o[tl[b], ql[b]]


def test_batched_transformed_matrices(rng):
    """Per-problem non-integer matrices (the heuristic path) in f64."""
    M = blosum62()
    freqs = rng.random(24)
    freqs /= freqs.sum()
    mats = np.stack(
        [transform_matrix(M + rng.normal(size=(24, 24)), 2.0, 1e4, freqs) for _ in range(4)]
    )
    q, ql, t, tl = _random_batch(rng, 4, 10, 10)
    r = fill_batch(q, ql, t, tl, mats, 7.0, 3.0, mode="local", dtype=jnp.float64)
    for b in range(4):
        a_o, d_o = oracle.fill_local(q[b, : ql[b]], t[b, : tl[b]], mats[b], 7.0, 3.0)
        assert np.array_equal(a_o, np.asarray(r.plane)[b, : tl[b] + 1, : ql[b] + 1])
        assert np.array_equal(d_o, np.asarray(r.dirs)[b, : tl[b] + 1, : ql[b] + 1])


def test_pwm_planes_match_oracle(rng):
    pwm = random_pwm(9, rng)
    q, ql, _, _ = _random_batch(rng, 8, 20, 20, vol=4)
    r = fill_pwm_batch(q, ql, pwm, 3.0, 1.0, dtype=jnp.float64)
    for b in range(8):
        a_o, d_o = oracle.fill_pwm(q[b, : ql[b]], pwm, 3.0, 1.0)
        assert np.array_equal(a_o, np.asarray(r.plane)[b, : ql[b] + 1, :])
        assert np.array_equal(d_o, np.asarray(r.dirs)[b, : ql[b] + 1, :])
        my, mx = oracle.argmax_first_rowmajor(a_o)
        assert (int(r.fy[b]), int(r.fx[b])) == (my, mx)


def test_f32_exact_for_integer_matrices(rng):
    """Integer-valued matrices give bit-identical results in f32."""
    M = blosum62()
    q, ql, t, tl = _random_batch(rng, 6, 12, 12)
    r32 = fill_batch(q, ql, t, tl, M, 11.0, 2.0, mode="local", dtype=jnp.float32)
    r64 = fill_batch(q, ql, t, tl, M, 11.0, 2.0, mode="local", dtype=jnp.float64)
    assert np.array_equal(
        np.asarray(r32.plane, np.float64), np.asarray(r64.plane)
    )
    assert np.array_equal(np.asarray(r32.dirs), np.asarray(r64.dirs))
