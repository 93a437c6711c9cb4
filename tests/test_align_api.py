"""End-to-end API tests: xla backend vs the scalar oracle backend."""

import numpy as np
import pytest

import aligner_tpu as at
from aligner_tpu.align import (
    PWMAligner,
    SimpleGlobalAligner,
    SimpleLocalAligner,
    align_global,
    align_local,
    align_pwm,
    batch_align,
    batch_align_pwm,
)
from aligner_tpu.io import read_fasta_file

EXAMPLES = "examples"


def _pairs_equal(a, b):
    assert np.array_equal(a.alignment.query, b.alignment.query)
    assert np.array_equal(a.alignment.target, b.alignment.target)
    assert a.alignment.coords == b.alignment.coords
    assert a.alignment.f == b.alignment.f


@pytest.mark.parametrize("mode", ["global", "local"])
def test_book_example_xla_matches_oracle(mode):
    recs = read_fasta_file(f"{EXAMPLES}/book_example_1.fasta")
    q, t = recs[0].seq.decode(), recs[1].seq.decode()
    fn = align_global if mode == "global" else align_local
    m = at.blosum62()
    a = fn(q, t, m, 11.0, 2.0, backend="xla")
    b = fn(q, t, m, 11.0, 2.0, backend="oracle")
    _pairs_equal(a, b)
    qa, ta = a.alignment.render()
    assert "_" in qa + ta or len(qa) == len(ta)


def test_protein_example_local_and_global():
    recs = read_fasta_file(f"{EXAMPLES}/protein.fasta")
    q, t = recs[0].seq.decode(), recs[1].seq.decode()
    m = at.blosum62()
    for fn in (align_local, align_global):
        a = fn(q, t, m, 11.0, 2.0, backend="xla")
        b = fn(q, t, m, 11.0, 2.0, backend="oracle")
        _pairs_equal(a, b)


def test_fuzz_simple_xla_vs_oracle(rng):
    m = at.blosum62()
    for trial in range(10):
        ql, tl = rng.integers(1, 40, size=2)
        q = rng.integers(0, 24, ql).astype(np.int8)
        t = rng.integers(0, 24, tl).astype(np.int8)
        del_, ext = float(rng.integers(1, 15)), float(rng.integers(1, 5))
        for fn in (align_local, align_global):
            try:
                a = fn(q, t, m, del_, ext, backend="xla", keep_planes=True)
            except at.ResultIsEmpty:
                with pytest.raises(at.ResultIsEmpty):
                    fn(q, t, m, del_, ext, backend="oracle")
                continue
            b = fn(q, t, m, del_, ext, backend="oracle", keep_planes=True)
            _pairs_equal(a, b)
            assert np.array_equal(a.score, b.score)
            assert np.array_equal(a.directions, b.directions)


def test_batch_align_scores_match_oracle(rng):
    m = at.blosum62()
    qs = [rng.integers(0, 24, rng.integers(5, 30)).astype(np.int8) for _ in range(12)]
    ts = [rng.integers(0, 24, rng.integers(5, 30)).astype(np.int8) for _ in range(12)]
    res = batch_align(qs, ts, m, 11.0, 2.0, mode="local", backend="xla")
    from aligner_tpu import oracle

    for b in range(12):
        a, _ = oracle.fill_local(qs[b], ts[b], m, 11.0, 2.0)
        assert float(res.fmax[b]) == a.max()
        my, mx = oracle.argmax_first_rowmajor(a)
        assert (int(res.fy[b]), int(res.fx[b])) == (my, mx)


def test_batch_align_with_alignments_matches_singles(rng):
    m = at.blosum62()
    qs = [rng.integers(0, 24, rng.integers(5, 25)).astype(np.int8) for _ in range(6)]
    ts = [rng.integers(0, 24, rng.integers(5, 25)).astype(np.int8) for _ in range(6)]
    batch = batch_align(qs, ts, m, 11.0, 2.0, mode="local",
                        backend="xla", with_alignments=True)
    for b, res in enumerate(batch):
        single = align_local(qs[b], ts[b], m, 11.0, 2.0, backend="oracle")
        _pairs_equal(res, single)


def test_pwm_xla_vs_oracle(rng):
    pwm = at.random_pwm(12, rng)
    for _ in range(5):
        q = rng.integers(0, 4, rng.integers(5, 40)).astype(np.int8)
        a = align_pwm(q, pwm, 3.0, 1.0, backend="xla")
        b = align_pwm(q, pwm, 3.0, 1.0, backend="oracle")
        assert np.array_equal(a.alignment.query, b.alignment.query)
        assert np.array_equal(a.alignment.numbered, b.alignment.numbered)
        assert a.alignment.coords == b.alignment.coords
        assert a.alignment.f == b.alignment.f


def test_batch_pwm_batched_matrices(rng):
    pwms = np.stack([at.random_pwm(10, rng) for _ in range(8)])
    qs = [rng.integers(0, 4, 20).astype(np.int8) for _ in range(8)]
    res = batch_align_pwm(qs, pwms, 3.0, 1.0, backend="xla")
    from aligner_tpu import oracle

    for b in range(8):
        a, _ = oracle.fill_pwm(qs[b], pwms[b], 3.0, 1.0)
        assert float(res.fmax[b]) == a.max()


def test_class_wrappers_and_errors():
    al = SimpleLocalAligner.from_str_seqs("HEAGAWGHEE", "PAWHEAE")
    res = al.perform_alignment(11.0, 2.0, at.blosum62(), backend="oracle")
    assert res.alignment.f > 0
    with pytest.raises(at.UnnecessaryArgument):
        al.perform_alignment(11.0, 2.0, at.blosum62(), heuristics=object())
    ga = SimpleGlobalAligner.from_str_seqs("HEAGAWGHEE", "PAWHEAE")
    assert ga.perform_alignment(11.0, 2.0, at.blosum62(), backend="oracle").alignment.f == 0.0
    pa = PWMAligner.from_str_seqs("ATCGATCG")
    with pytest.raises(at.MatrixShapeError):
        pa.perform_alignment(3.0, 1.0, np.zeros((5, 4)))
