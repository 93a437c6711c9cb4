"""Single-pair global wavefront kernel: bit-parity with the oracle.

The row-scan engine (ops/wavefront.py) computes the exact reference
recurrence via max-prefix-scans — valid in global mode only, where the
penalty is constant ext after cell (1,1) (SURVEY.md §2.3.3).  All tests
run in interpret mode on CPU; the same kernel compiles for TPU.
"""

from __future__ import annotations

import numpy as np
import pytest

import aligner_tpu as at
from aligner_tpu import host
from aligner_tpu.errors import ValidationError
from aligner_tpu.ops.wavefront import fill_single_global, supported


def test_fuzz_parity_vs_oracle(rng):
    M = np.asarray(at.blosum62())
    for _ in range(8):
        C = int(rng.integers(1, 300))
        R = int(rng.integers(1, 300))
        q = rng.integers(0, 24, C).astype(np.int8)
        t = rng.integers(0, 24, R).astype(np.int8)
        ref = host.align_global(q, t, M, 11.0, 2.0)
        end, dirs = fill_single_global(q, t, M, 11.0, 2.0, interpret=True)
        assert end == ref.score[R, C]
        np.testing.assert_array_equal(dirs, ref.directions)


def test_lane_boundary_widths(rng):
    """Widths straddling the 128-lane tile edges (the flattened shift
    and two-level prefix-scan seams)."""
    M = np.asarray(at.blosum62())
    t = rng.integers(0, 24, 40).astype(np.int8)
    for C in (127, 128, 129, 255, 256, 257):
        q = rng.integers(0, 24, C).astype(np.int8)
        ref = host.align_global(q, t, M, 7.0, 3.0)
        end, dirs = fill_single_global(q, t, M, 7.0, 3.0, interpret=True)
        assert end == ref.score[len(t), C]
        np.testing.assert_array_equal(dirs, ref.directions)


def test_dna_alphabet(rng):
    m = rng.integers(-4, 8, (4, 4)).astype(np.float64)
    q = rng.integers(0, 4, 150).astype(np.int8)
    t = rng.integers(0, 4, 90).astype(np.int8)
    ref = host.align_global(q, t, m, 5.0, 2.0)
    end, dirs = fill_single_global(q, t, m, 5.0, 2.0, interpret=True)
    assert end == ref.score[90, 150]
    np.testing.assert_array_equal(dirs, ref.directions)


def test_scores_only_mode(rng):
    M = np.asarray(at.blosum62())
    q = rng.integers(0, 24, 70).astype(np.int8)
    t = rng.integers(0, 24, 130).astype(np.int8)
    ref = host.align_global(q, t, M, 11.0, 2.0)
    end, dirs = fill_single_global(
        q, t, M, 11.0, 2.0, with_dirs=False, interpret=True
    )
    assert dirs is None
    assert end == ref.score[130, 70]


def test_align_global_wavefront_backend(rng):
    """align_global(backend='wavefront') produces the identical
    alignment to the oracle (full route incl. traceback)."""
    M = at.blosum62()
    q = rng.integers(0, 24, 120).astype(np.int8)
    t = rng.integers(0, 24, 140).astype(np.int8)
    wf = at.align_global(q, t, M, 11.0, 2.0, backend="wavefront",
                         keep_planes=True)
    ref = at.align_global(q, t, M, 11.0, 2.0, backend="oracle",
                          keep_planes=True)
    assert np.array_equal(wf.alignment.query, ref.alignment.query)
    assert np.array_equal(wf.alignment.target, ref.alignment.target)
    assert wf.alignment.coords == ref.alignment.coords
    np.testing.assert_array_equal(wf.directions, ref.directions)


def test_unsupported_raises():
    m = np.full((24, 24), 0.5)  # non-integral
    assert not supported(10, m, 11.0, 2.0)
    with pytest.raises(ValueError):
        fill_single_global(
            np.zeros(4, np.int8), np.zeros(4, np.int8), m, 11.0, 2.0,
            interpret=True,
        )
    with pytest.raises(ValidationError):
        at.align_global(
            np.zeros(4, np.int8), np.zeros(4, np.int8), m, 11.0, 2.0,
            backend="wavefront",
        )


@pytest.mark.tpu
def test_wavefront_hardware_spot(rng):
    M = np.asarray(at.blosum62())
    q = rng.integers(0, 24, 1000).astype(np.int8)
    t = rng.integers(0, 24, 1500).astype(np.int8)
    ref = host.align_global(q, t, M, 11.0, 2.0)
    end, dirs = fill_single_global(q, t, M, 11.0, 2.0, interpret=False)
    assert end == ref.score[1500, 1000]
    np.testing.assert_array_equal(dirs, ref.directions)


def test_chunked_traceback_matches_oracle(rng):
    """Checkpoint-and-replay traceback: exact alignment strings without
    a full direction plane (blocks re-filled on demand)."""
    from aligner_tpu.ops.wavefront import align_single_global_chunked

    M = np.asarray(at.blosum62())
    for C, R in [(200, 500), (130, 97), (50, 300)]:
        q = rng.integers(0, 24, C).astype(np.int8)
        t = rng.integers(0, 24, R).astype(np.int8)
        ref = host.align_global(q, t, M, 11.0, 2.0)
        end, qa, ta, coords = align_single_global_chunked(
            q, t, M, 11.0, 2.0, tb_rows=64, tr=16, interpret=True
        )
        assert end == ref.score[R, C]
        np.testing.assert_array_equal(qa, ref.query_aligned)
        np.testing.assert_array_equal(ta, ref.target_aligned)
        assert coords == ((1, C), (1, R))


def test_align_global_chunked_route(rng, monkeypatch):
    """align_global routes past-the-plane-budget pairs through the
    chunked walk and still matches the oracle exactly."""
    from aligner_tpu.ops import wavefront

    monkeypatch.setattr(wavefront, "DIRECT_PLANE_CELLS", 1000)
    q = rng.integers(0, 24, 80).astype(np.int8)
    t = rng.integers(0, 24, 90).astype(np.int8)
    M = at.blosum62()
    res = at.align_global(q, t, M, 11.0, 2.0, backend="wavefront")
    ref = at.align_global(q, t, M, 11.0, 2.0, backend="oracle")
    assert np.array_equal(res.alignment.query, ref.alignment.query)
    assert np.array_equal(res.alignment.target, ref.alignment.target)
    assert res.alignment.coords == ref.alignment.coords


@pytest.mark.tpu
def test_chunked_hardware_spot(rng):
    from aligner_tpu.ops.wavefront import align_single_global_chunked

    M = np.asarray(at.blosum62())
    q = rng.integers(0, 24, 900).astype(np.int8)
    t = rng.integers(0, 24, 3000).astype(np.int8)
    ref = host.align_global(q, t, M, 11.0, 2.0)
    end, qa, ta, _ = align_single_global_chunked(
        q, t, M, 11.0, 2.0, tb_rows=1024, interpret=False
    )
    assert end == ref.score[3000, 900]
    np.testing.assert_array_equal(qa, ref.query_aligned)
    np.testing.assert_array_equal(ta, ref.target_aligned)


def test_pack_matrix_words_agrees_with_pallas_dp(rng):
    """The host packer and pallas_dp's traced packing produce identical
    words — the cross-engine byte-layout contract."""
    import jax.numpy as jnp

    from aligner_tpu.ops.wavefront import pack_matrix_words

    M = rng.integers(-30, 30, (24, 24))
    host_words = pack_matrix_words(M)

    # re-derive via the jnp formulation used inside pallas_dp._run
    mat = jnp.asarray(M, jnp.int32)
    rows = []
    for g in range(6):
        w = jnp.zeros((24,), jnp.int32)
        for k in range(4):
            v = 4 * g + k
            if v < 24:
                w = w + ((mat[v] + 128) << (8 * k))
        rows.append(w)
    np.testing.assert_array_equal(np.asarray(jnp.stack(rows)), host_words)


def test_chunked_block_boundary_shapes(rng):
    """Row counts exactly at / one past the checkpoint block size."""
    from aligner_tpu.ops.wavefront import align_single_global_chunked

    M = np.asarray(at.blosum62())
    q = rng.integers(0, 24, 45).astype(np.int8)
    for R in (64, 65, 128, 127):
        t = rng.integers(0, 24, R).astype(np.int8)
        ref = host.align_global(q, t, M, 11.0, 2.0)
        end, qa, ta, _ = align_single_global_chunked(
            q, t, M, 11.0, 2.0, tb_rows=64, tr=16, interpret=True
        )
        assert end == ref.score[R, 45]
        np.testing.assert_array_equal(qa, ref.query_aligned)
        np.testing.assert_array_equal(ta, ref.target_aligned)


def test_empty_sequences_raise():
    from aligner_tpu.ops.wavefront import (
        align_single_global_chunked,
        fill_single_global,
        pack_matrix_words,
    )

    M = np.asarray(at.blosum62())
    with pytest.raises(ValueError):
        fill_single_global(np.zeros(0, np.int8), np.zeros(5, np.int8),
                           M, 11.0, 2.0, interpret=True)
    with pytest.raises(ValueError):
        fill_single_global(np.zeros(5, np.int8), np.zeros(0, np.int8),
                           M, 11.0, 2.0, interpret=True)
    with pytest.raises(ValueError):
        align_single_global_chunked(np.zeros(0, np.int8),
                                    np.zeros(5, np.int8), M, 11.0, 2.0,
                                    interpret=True)
    with pytest.raises(ValueError):
        pack_matrix_words(np.full((24, 24), 200.0))


def test_compile_bucket_reuse(rng):
    """Distinct real pair lengths inside one padded bucket (S sublanes ×
    n_blocks row-blocks) share ONE compiled program — C_real/R_real ride
    in as traced SMEM scalars (the compile-bucket lever,
    docs/PERF_NOTES.md: a static length costs a fresh ~60 s remote
    compile per distinct pair shape on tunnel backends)."""
    from aligner_tpu.ops import wavefront

    M = np.asarray(at.blosum62())
    # all in the S=1 (C <= 128), R_pad=192 (tr=64) bucket
    sizes = []
    for C, R in [(100, 150), (90, 140), (128, 129)]:
        q = rng.integers(0, 24, C).astype(np.int8)
        t = rng.integers(0, 24, R).astype(np.int8)
        ref = host.align_global(q, t, M, 11.0, 2.0)
        end, dirs = fill_single_global(q, t, M, 11.0, 2.0, interpret=True)
        assert end == ref.score[R, C]
        np.testing.assert_array_equal(dirs, ref.directions)
        sizes.append(wavefront._run._cache_size())
    assert sizes[1] == sizes[0] and sizes[2] == sizes[0], sizes


def test_chunked_device_walk_matches_host_walk(rng, monkeypatch):
    """The fused on-device replay+walk (default) is bit-identical to the
    host per-cell walk over downloaded direction blocks, including
    block-straddling walks and the border runs."""
    from aligner_tpu.ops.wavefront import align_single_global_chunked

    M = np.asarray(at.blosum62())
    for C, R in [(150, 300), (97, 64), (64, 130), (20, 3)]:
        q = rng.integers(0, 24, C).astype(np.int8)
        t = rng.integers(0, 24, R).astype(np.int8)
        monkeypatch.setenv("ALIGNER_DEVICE_WALK", "1")
        dev = align_single_global_chunked(
            q, t, M, 11.0, 2.0, tb_rows=64, tr=16, interpret=True
        )
        monkeypatch.setenv("ALIGNER_DEVICE_WALK", "0")
        hst = align_single_global_chunked(
            q, t, M, 11.0, 2.0, tb_rows=64, tr=16, interpret=True
        )
        assert dev[0] == hst[0]
        np.testing.assert_array_equal(dev[1], hst[1])
        np.testing.assert_array_equal(dev[2], hst[2])
        assert dev[3] == hst[3]


def test_scoped_vmem_preflight(monkeypatch, caplog):
    """Wide row-scan fills exceed libtpu's default 16 MiB scoped-VMEM
    limit at compile time (measured: 16.53 MiB at 256k columns); the
    pre-flight parses LIBTPU_INIT_ARGS and warns with the exact flag."""
    import logging

    from aligner_tpu.ops import wavefront as wf

    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    assert wf._scoped_vmem_kib() == 16 * 1024
    monkeypatch.setenv(
        "LIBTPU_INIT_ARGS",
        "--foo=1 --xla_tpu_scoped_vmem_limit_kib=65536 --bar=2",
    )
    assert wf._scoped_vmem_kib() == 65536

    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    monkeypatch.setattr(wf, "on_tpu", lambda: True)
    monkeypatch.setattr(wf, "_warned_vmem_widths", set())
    with caplog.at_level(logging.WARNING, logger="aligner_tpu"):
        wf._check_scoped_vmem(64 * 1024)  # 64k columns: fits the default
        assert not caplog.records
        wf._check_scoped_vmem(256 * 1024)  # 256k: needs ~16.8 MiB
        assert any("scoped_vmem_limit_kib" in r.getMessage()
                   for r in caplog.records)
        n = len(caplog.records)
        wf._check_scoped_vmem(256 * 1024)  # warned once per width
        assert len(caplog.records) == n
    # raised limit: no warning
    monkeypatch.setenv(
        "LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=65536"
    )
    monkeypatch.setattr(wf, "_warned_vmem_widths", set())
    with caplog.at_level(logging.WARNING, logger="aligner_tpu"):
        caplog.clear()
        wf._check_scoped_vmem(256 * 1024)
        assert not caplog.records
