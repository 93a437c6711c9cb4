"""Band-diagonal end-score kernel: bit-parity with the oracle.

The scan-free single-pair engine (ops/wavefront.py, round 3): walks the
DP matrix in TB-row bands and runs the anti-diagonals inside a band, so
no prefix scan is needed at all (anti-diagonal cells are independent).
Scores only — see the module's section comment for why it cannot emit
direction planes.  All tests run in interpret mode on CPU with small
TB/TD so band and chunk seams are exercised; the same kernel compiles
for TPU (67.7 GCUPS at 64k x 64k, docs/PERF_NOTES.md §3).
"""

from __future__ import annotations

import numpy as np
import pytest

import aligner_tpu as at
from aligner_tpu import host
from aligner_tpu.errors import ResultIsEmpty, ValidationError
from aligner_tpu.ops.wavefront import (
    end_score_single_global_diag,
    pack_matrix_nibbles,
)


def test_fuzz_parity_vs_oracle(rng):
    M = np.asarray(at.blosum62())
    for _ in range(8):
        C = int(rng.integers(1, 300))
        R = int(rng.integers(1, 300))
        q = rng.integers(0, 24, C).astype(np.int8)
        t = rng.integers(0, 24, R).astype(np.int8)
        ref = host.align_global(q, t, M, 11.0, 2.0)
        got = end_score_single_global_diag(
            q, t, M, 11.0, 2.0, tb=128, td=128, interpret=True
        )
        assert got == ref.score[R, C]


def test_band_and_chunk_seams(rng):
    """Row counts at / one past the band height and widths at / one past
    the chunk length — the boundary-row handoff and q-stream seams."""
    M = np.asarray(at.blosum62())
    for R in (127, 128, 129, 256, 257):
        for C in (127, 128, 129):
            q = rng.integers(0, 24, C).astype(np.int8)
            t = rng.integers(0, 24, R).astype(np.int8)
            ref = host.align_global(q, t, M, 7.0, 3.0)
            got = end_score_single_global_diag(
                q, t, M, 7.0, 3.0, tb=128, td=128, interpret=True
            )
            assert got == ref.score[R, C], (R, C)


def test_single_cell_and_degenerate(rng):
    M = np.asarray(at.blosum62())
    for R, C in [(1, 1), (1, 200), (200, 1), (129, 1), (1, 129)]:
        q = rng.integers(0, 24, C).astype(np.int8)
        t = rng.integers(0, 24, R).astype(np.int8)
        ref = host.align_global(q, t, M, 11.0, 2.0)
        got = end_score_single_global_diag(
            q, t, M, 11.0, 2.0, tb=128, td=128, interpret=True
        )
        assert got == ref.score[R, C], (R, C)


def test_wide_range_matrix_uses_8bit_path(rng):
    """Entry range > 16 forces the 8-bit packed-word lookup; parity must
    hold there too (DNA-style small alphabet, big scores)."""
    m = rng.integers(-30, 30, (4, 4)).astype(np.float64)
    assert int(m.max()) - int(m.min()) > 15
    q = rng.integers(0, 4, 150).astype(np.int8)
    t = rng.integers(0, 4, 170).astype(np.int8)
    ref = host.align_global(q, t, m, 5.0, 2.0)
    got = end_score_single_global_diag(
        q, t, m, 5.0, 2.0, tb=128, td=128, interpret=True
    )
    assert got == ref.score[170, 150]


def test_pack_matrix_nibbles_roundtrip(rng):
    M = rng.integers(-4, 12, (24, 24))
    words, bias = pack_matrix_nibbles(M)
    assert bias == int(M.min())
    assert words.shape == (3, 24)
    un = np.zeros_like(M)
    wu = words.view(np.uint32).astype(np.int64)
    for v in range(24):
        un[v] = ((wu[v // 8] >> (4 * (v % 8))) & 15) + bias
    np.testing.assert_array_equal(un, M)
    with pytest.raises(ValueError):
        pack_matrix_nibbles(np.array([[0.0, 40.0], [0.0, 0.0]]))


def test_global_end_score_small_uses_host(rng):
    """The public API: small pairs route to the native host fill."""
    M = at.blosum62()
    q = rng.integers(0, 24, 60).astype(np.int8)
    t = rng.integers(0, 24, 80).astype(np.int8)
    ref = host.align_global(np.asarray(q), np.asarray(t),
                            np.asarray(M), 11.0, 2.0)
    assert at.global_end_score(q, t, M, 11.0, 2.0) == ref.score[80, 60]


def test_global_end_score_diag_backend(rng):
    M = at.blosum62()
    q = rng.integers(0, 24, 150).astype(np.int8)
    t = rng.integers(0, 24, 170).astype(np.int8)
    ref = host.align_global(np.asarray(q), np.asarray(t),
                            np.asarray(M), 11.0, 2.0)
    got = at.global_end_score(q, t, M, 11.0, 2.0, backend="diag")
    assert got == ref.score[170, 150]


def test_global_end_score_errors(rng):
    M = at.blosum62()
    with pytest.raises(ResultIsEmpty):
        at.global_end_score(np.zeros(0, np.int8), np.zeros(5, np.int8),
                            M, 11.0, 2.0)
    with pytest.raises(ValidationError):
        at.global_end_score(np.zeros(5, np.int8), np.zeros(5, np.int8),
                            np.full((24, 24), 0.5), 11.0, 2.0,
                            backend="diag")


def test_global_end_score_huge_routes_off_plane(rng, monkeypatch):
    """Past the plane budget the API must not materialize O(R*C): with
    several devices visible it routes to the column-sharded pipeline,
    and a non-integral matrix raises instead of falling through."""
    from aligner_tpu.ops import wavefront

    monkeypatch.setattr(wavefront, "DIRECT_PLANE_CELLS", 1000)
    M = at.blosum62()
    q = rng.integers(0, 24, 80).astype(np.int8)
    t = rng.integers(0, 24, 90).astype(np.int8)
    ref = host.align_global(np.asarray(q), np.asarray(t),
                            np.asarray(M), 11.0, 2.0)
    assert at.global_end_score(q, t, M, 11.0, 2.0) == ref.score[90, 80]
    with pytest.raises(ValidationError):
        at.global_end_score(q, t, np.full((24, 24), 0.5), 11.0, 2.0)


@pytest.mark.tpu
def test_diag_hardware_spot(rng):
    M = np.asarray(at.blosum62())
    q = rng.integers(0, 24, 1000).astype(np.int8)
    t = rng.integers(0, 24, 1500).astype(np.int8)
    ref = host.align_global(q, t, M, 11.0, 2.0)
    got = end_score_single_global_diag(q, t, M, 11.0, 2.0,
                                       tb=256, td=512, interpret=False)
    assert got == ref.score[1500, 1000]


def test_compile_bucket_reuse_diag(rng):
    """Distinct real lengths inside one padded bucket (S sublanes,
    n_bands, D_pad chunks) share ONE compiled band program — the real
    lengths ride in as traced SMEM scalars (compile-bucket lever,
    docs/PERF_NOTES.md)."""
    from aligner_tpu.ops import wavefront

    M = np.asarray(at.blosum62())
    sizes = []
    # both land in the TB=256 (R in 129..256), D_pad=512 bucket
    for C, R in [(150, 200), (140, 190)]:
        q = rng.integers(0, 24, C).astype(np.int8)
        t = rng.integers(0, 24, R).astype(np.int8)
        ref = host.align_global(q, t, M, 11.0, 2.0)
        got = end_score_single_global_diag(
            q, t, M, 11.0, 2.0, tb=256, td=512, interpret=True
        )
        assert got == ref.score[R, C]
        sizes.append(wavefront._run_band._cache_size())
    assert sizes[1] == sizes[0], sizes
