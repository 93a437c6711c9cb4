"""Whole-example parity: the three reference FASTAs through every engine.

BASELINE.json's correctness bar: bit-identical alignments to aligner-core
on examples/{book_example_1,human_gene_example,protein}.fasta.  The
ground truth is the Python oracle (validated against the reference's
golden fixtures in test_oracle_golden.py); here the C++ host engine and
the XLA engine are held to it on the real example files.
"""

import numpy as np
import pytest

import aligner_tpu as at
from aligner_tpu import native, oracle
from aligner_tpu.io import read_fasta_file


def _codes(path):
    recs = read_fasta_file(path)
    return [at.Protein.encode(r.seq, strict=True) for r in recs[:2]]


@pytest.mark.parametrize(
    "example", ["book_example_1", "protein", "human_gene_example"]
)
def test_native_engine_matches_oracle_on_examples(example):
    if not native.available():
        pytest.skip("native library unavailable")
    q, t = _codes(f"examples/{example}.fasta")
    for mode, fn in [("local", oracle.fill_local), ("global", oracle.fill_global)]:
        p_n, d_n = native.fill(q, t, np.asarray(at.blosum62()), 11.0, 2.0, mode)
        p_o, d_o = fn(q, t, np.asarray(at.blosum62()), 11.0, 2.0)
        assert np.array_equal(p_n, p_o)
        assert np.array_equal(d_n, d_o)


@pytest.mark.parametrize("example", ["book_example_1", "protein"])
def test_full_alignment_identity_across_engines(example):
    q, t = _codes(f"examples/{example}.fasta")
    m = at.blosum62()
    results = {}
    for backend in ("oracle", "xla"):
        for mode, fn in [("local", at.align_local), ("global", at.align_global)]:
            r = fn(q, t, m, 11.0, 2.0, backend=backend)
            results.setdefault(mode, []).append(r)
    for mode, (a, b) in results.items():
        assert np.array_equal(a.alignment.query, b.alignment.query), mode
        assert np.array_equal(a.alignment.target, b.alignment.target), mode
        assert a.alignment.coords == b.alignment.coords
        assert a.alignment.f == b.alignment.f


@pytest.mark.slow
def test_human_gene_xla_matches_oracle_planes():
    q, t = _codes("examples/human_gene_example.fasta")
    m = at.blosum62()
    a = at.align_local(q, t, m, 11.0, 2.0, backend="xla", keep_planes=True)
    b = at.align_local(q, t, m, 11.0, 2.0, backend="oracle", keep_planes=True)
    assert np.array_equal(a.score, b.score)
    assert np.array_equal(a.directions, b.directions)
    assert np.array_equal(a.alignment.query, b.alignment.query)
