"""C++ host runtime: bit-identity with the Python oracle."""

import numpy as np
import pytest

from aligner_tpu import native, oracle
from aligner_tpu.alphabet import DNA, Protein
from aligner_tpu.matrices import blosum62, random_pwm

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_fill_bit_identity_fuzz(rng):
    M = np.asarray(blosum62())
    for _ in range(15):
        ql, tl = rng.integers(1, 50, 2)
        q = rng.integers(0, 24, ql).astype(np.int8)
        t = rng.integers(0, 24, tl).astype(np.int8)
        d, e = float(rng.integers(1, 15)), float(rng.integers(1, 5))
        mx = M + rng.normal(size=(24, 24))
        for mode, fn in [("local", oracle.fill_local), ("global", oracle.fill_global)]:
            p_n, d_n = native.fill(q, t, mx, d, e, mode)
            p_o, d_o = fn(q, t, mx, d, e)
            assert np.array_equal(p_n, p_o)
            assert np.array_equal(d_n, d_o)


def test_pwm_fill_and_argmax(rng):
    pwm = random_pwm(11, rng)
    q = rng.integers(0, 4, 30).astype(np.int8)
    p_n, d_n = native.fill(q, None, pwm, 3.0, 1.0, "pwm")
    p_o, d_o = oracle.fill_pwm(q, pwm, 3.0, 1.0)
    assert np.array_equal(p_n, p_o)
    assert np.array_equal(d_n, d_o)
    assert native.argmax_first_rowmajor(p_n) == oracle.argmax_first_rowmajor(p_o)


def test_traceback_batch_matches_python(rng):
    M = np.asarray(blosum62())
    B, L = 6, 20
    q = rng.integers(0, 24, (B, L)).astype(np.int8)
    t = rng.integers(0, 24, (B, L)).astype(np.int8)
    dirs = np.zeros((B, L + 1, L + 1), np.uint8)
    sy = np.zeros(B, np.int64)
    sx = np.zeros(B, np.int64)
    expected = []
    for b in range(B):
        plane, d = oracle.fill_local(q[b], t[b], M, 11.0, 2.0)
        dirs[b] = d
        my, mx = oracle.argmax_first_rowmajor(plane)
        sy[b], sx[b] = my, mx
        qa = [int(q[b][mx - 1])]
        ta = [int(t[b][my - 1])]
        cy, cx = oracle._walk(d, my, mx, q[b], t[b], qa, ta, pwm_mode=False)
        qa.reverse()
        ta.reverse()
        expected.append((qa, ta, cy, cx))
    wq, wt, ey, ex = native.traceback_batch(dirs, sy, sx, q, t, pwm_mode=False)
    for b in range(B):
        qa, ta, cy, cx = expected[b]
        got_q = list(wq[b]) + [int(q[b][sx[b] - 1])]
        got_t = list(wt[b]) + [int(t[b][sy[b] - 1])]
        assert got_q == qa
        assert got_t == ta
        assert (int(ey[b]), int(ex[b])) == (cy, cx)


def test_encode_matches_python():
    raw = b"ATCGNNATXXCGQQQA"
    codes, counts, idx = native.encode(raw, DNA._enc_lut, 4)
    c2, f2, idx2 = DNA.encode_with_freqs_and_indices(raw)
    assert np.array_equal(codes, c2)
    assert np.array_equal(
        counts / max(len(codes), 1), f2
    )
    # native emits ascending coords; the engine consumes descending
    assert [(c, o, l) for (c, o, l) in reversed(idx)] == [
        (i.coord, i.offset, i.local_offset) for i in idx2
    ]
    pcodes = Protein.encode("ARND", strict=True)
    ncodes, _, _ = native.encode(b"ARND", Protein._enc_lut, 24)
    assert np.array_equal(pcodes, ncodes)


def test_host_align_large_pair_fast():
    """Chromosome-ish single pair through the auto backend (host native)."""
    import time

    import aligner_tpu as at

    rng = np.random.default_rng(0)
    q = rng.integers(0, 24, 700).astype(np.int8)
    t = rng.integers(0, 24, 700).astype(np.int8)
    t0 = time.time()
    res = at.align_local(q, t, at.blosum62(), 11.0, 2.0)
    assert time.time() - t0 < 2.0
    ref = at.align_local(q, t, at.blosum62(), 11.0, 2.0, backend="xla")
    assert res.alignment.f == ref.alignment.f
    assert np.array_equal(res.alignment.query, ref.alignment.query)


def test_batch_align_pad_to_with_alignments(rng):
    """pad_to padding (ql=tl=0, fy=fx=0) must not trip the native
    traceback's empty-result check (ADVICE.md round-1 item): the padded
    slots are internal and only the n_real alignments come back."""
    import aligner_tpu as at
    from aligner_tpu.align import batch_align

    qs = [rng.integers(0, 24, 30).astype(np.int8) for _ in range(2)]
    ts = [rng.integers(0, 24, 30).astype(np.int8) for _ in range(2)]
    out = batch_align(
        qs, ts, at.blosum62(), 11.0, 2.0,
        mode="local", backend="xla", with_alignments=True, pad_to=8,
    )
    assert len(out) == 2
    ref = batch_align(
        qs, ts, at.blosum62(), 11.0, 2.0,
        mode="local", backend="xla", with_alignments=True,
    )
    for a, b in zip(out, ref):
        assert a.alignment.f == b.alignment.f
        assert np.array_equal(a.alignment.query, b.alignment.query)
        assert np.array_equal(a.alignment.target, b.alignment.target)
        assert a.alignment.coords == b.alignment.coords
    # global mode takes the tl/ql-seeded path — cover it too
    outg = batch_align(
        qs, ts, at.blosum62(), 11.0, 2.0,
        mode="global", backend="xla", with_alignments=True, pad_to=8,
    )
    refg = batch_align(
        qs, ts, at.blosum62(), 11.0, 2.0,
        mode="global", backend="xla", with_alignments=True,
    )
    for a, b in zip(outg, refg):
        assert np.array_equal(a.alignment.query, b.alignment.query)
        assert a.alignment.coords == b.alignment.coords
