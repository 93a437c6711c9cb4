"""Pallas kernel parity tests (interpret mode on CPU, compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from aligner_tpu import oracle
from aligner_tpu.backend import on_tpu
from aligner_tpu.matrices import blosum62
from aligner_tpu.ops.pallas_dp import fill_batch_pallas, fill_pwm_batch_pallas

DT = jnp.float32 if on_tpu() else jnp.float64


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
def test_pallas_planes_match_oracle(rng, mode):
    M = blosum62()
    q, ql, t, tl = _random_batch(rng, 6, 9, 11)
    r = fill_batch_pallas(q, ql, t, tl, M, 11.0, 2.0, mode=mode, dtype=DT)
    plane, dirs = np.asarray(r.plane), np.asarray(r.dirs)
    fn = oracle.fill_local if mode == "local" else oracle.fill_global
    for b in range(6):
        a_o, d_o = fn(q[b, : ql[b]], t[b, : tl[b]], M, 11.0, 2.0)
        assert np.array_equal(a_o, plane[b, : tl[b] + 1, : ql[b] + 1])
        assert np.array_equal(d_o, dirs[b, : tl[b] + 1, : ql[b] + 1])
        if mode == "local":
            my, mx = oracle.argmax_first_rowmajor(a_o)
            assert (int(r.fy[b]), int(r.fx[b])) == (my, mx)
        assert float(r.end[b]) == a_o[tl[b], ql[b]]


def test_pallas_scores_only(rng):
    M = blosum62()
    q, ql, t, tl = _random_batch(rng, 6, 9, 11)
    r = fill_batch_pallas(
        q, ql, t, tl, M, 11.0, 2.0, mode="local", with_planes=False, dtype=DT
    )
    assert r.plane is None and r.dirs is None
    for b in range(6):
        a_o, _ = oracle.fill_local(q[b, : ql[b]], t[b, : tl[b]], M, 11.0, 2.0)
        assert float(r.fmax[b]) == a_o.max()


def test_pallas_pwm_shared_and_batched(rng):
    W = 7
    pwm = rng.integers(-1, 2, (4, W)).astype(np.float64)
    pwms = rng.integers(-1, 2, (6, 4, W)).astype(np.float64)
    q, ql, _, _ = _random_batch(rng, 6, 14, 14, vol=4)
    r = fill_pwm_batch_pallas(q, ql, pwm, 3.0, 1.0, dtype=DT)
    rb = fill_pwm_batch_pallas(q, ql, pwms, 3.0, 1.0, dtype=DT, with_planes=False)
    for b in range(6):
        a_o, d_o = oracle.fill_pwm(q[b, : ql[b]], pwm, 3.0, 1.0)
        assert np.array_equal(a_o, np.asarray(r.plane)[b, : ql[b] + 1, :])
        assert np.array_equal(d_o, np.asarray(r.dirs)[b, : ql[b] + 1, :])
        a_b, _ = oracle.fill_pwm(q[b, : ql[b]], pwms[b], 3.0, 1.0)
        assert float(rb.fmax[b]) == a_b.max()


def test_pallas_batched_matrices(rng):
    M = blosum62()
    mats = np.stack([M + rng.integers(-2, 3, (24, 24)) for _ in range(5)]).astype(
        np.float64
    )
    q, ql, t, tl = _random_batch(rng, 5, 8, 8)
    r = fill_batch_pallas(q, ql, t, tl, mats, 7.0, 3.0, mode="local", dtype=DT)
    for b in range(5):
        a_o, d_o = oracle.fill_local(q[b, : ql[b]], t[b, : tl[b]], mats[b], 7.0, 3.0)
        assert np.array_equal(a_o, np.asarray(r.plane)[b, : tl[b] + 1, : ql[b] + 1])


@pytest.mark.tpu
def test_pallas_tpu_large_batch_matches_scan_engine(rng):
    """On hardware: pallas f32 vs xla f32 on a bigger batch."""
    from aligner_tpu.ops import fill_batch

    M = blosum62()
    q, ql, t, tl = _random_batch(rng, 512, 64, 64)
    rp = fill_batch_pallas(
        q, ql, t, tl, M, 11.0, 2.0, mode="local", with_planes=False, dtype=jnp.float32
    )
    rx = fill_batch(
        q, ql, t, tl, jnp.asarray(M, jnp.float32), 11.0, 2.0,
        mode="local", with_planes=False, dtype=jnp.float32,
    )
    assert np.array_equal(np.asarray(rp.fmax), np.asarray(rx.fmax))
    assert np.array_equal(np.asarray(rp.fy), np.asarray(rx.fy))
    assert np.array_equal(np.asarray(rp.fx), np.asarray(rx.fx))


@pytest.mark.tpu
def test_pallas_tpu_full_planes_match_scan_engine(rng):
    """Full-mode planes on hardware vs XLA f32 (incl. traceback region)."""
    from aligner_tpu.ops import fill_batch

    M = blosum62()
    q, ql, t, tl = _random_batch(rng, 140, 33, 50)
    for mode in ("local", "global"):
        rp = fill_batch_pallas(q, ql, t, tl, M, 11.0, 2.0, mode=mode,
                               dtype=jnp.float32)
        rx = fill_batch(q, ql, t, tl, jnp.asarray(M, jnp.float32), 11.0, 2.0,
                        mode=mode, dtype=jnp.float32)
        assert np.array_equal(np.asarray(rp.plane), np.asarray(rx.plane))
        assert np.array_equal(np.asarray(rp.dirs), np.asarray(rx.dirs))


@pytest.mark.tpu
def test_pallas_tpu_pwm_and_batched_matrices(rng):
    from aligner_tpu.ops import fill_pwm_batch

    W = 12
    pwms = rng.integers(-1, 2, (256, 4, W)).astype(np.float64)
    q, ql, _, _ = _random_batch(rng, 256, 40, 40, vol=4)
    rp = fill_pwm_batch_pallas(q, ql, pwms, 3.0, 1.0, with_planes=False,
                               dtype=jnp.float32)
    rx = fill_pwm_batch(q, ql, jnp.asarray(pwms, jnp.float32), 3.0, 1.0,
                        with_planes=False, dtype=jnp.float32)
    assert np.array_equal(np.asarray(rp.fmax), np.asarray(rx.fmax))
    assert np.array_equal(np.asarray(rp.fy), np.asarray(rx.fy))


def test_lut_params_selection():
    """4-bit packing engages exactly when the integral entry range fits
    16 values (BLOSUM62 is -4..11); wider ranges use 8-bit bytes."""
    from aligner_tpu.ops.pallas_dp import lut_params

    packed, bits, bias = lut_params(blosum62())
    assert (packed, bits, bias) == (True, 4, -4)
    wide = np.zeros((24, 24)); wide[0, 0] = 20; wide[1, 1] = -20
    assert lut_params(wide) == (True, 8, 0)
    assert lut_params(np.full((24, 24), 0.5))[0] is False
    big = np.zeros((24, 24)); big[0, 0] = 200
    assert lut_params(big)[0] is False


def test_packed_lut_4bit_matches_8bit(rng):
    """The 4-bit nibble-packed score path is bit-identical to the 8-bit
    byte-packed path (and hence the oracle) on the same inputs."""
    from aligner_tpu.ops.pallas_dp import fill_scores_traced

    M = np.asarray(blosum62())
    q, ql, t, tl = _random_batch(rng, 4, 16, 24)
    outs = {}
    for bits, bias in ((8, 0), (4, -4)):
        outs[bits] = fill_scores_traced(
            q, ql, t, tl, jnp.asarray(np.round(M).astype(np.int32)),
            11.0, 2.0, mode="local", dtype=DT,
            packed_lut=True, lut_bits=bits, lut_bias=bias,
        )
    for a, b in zip(outs[8], outs[4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
