"""IO round trips: FASTA, matrices, CSV records."""

import numpy as np

from aligner_tpu.io import (
    FastaRecord,
    matrix_from_csv,
    matrix_to_csv,
    read_fasta,
    read_records,
    write_fasta,
    write_records,
)
from aligner_tpu.io.records import Record


def test_fasta_roundtrip():
    recs = [
        FastaRecord("chr1 some description", b"ACGTACGTACGT" * 20),
        FastaRecord("chr2", b"TTTT"),
    ]
    text = write_fasta(recs, width=50)
    back = read_fasta(text)
    assert [r.head for r in back] == ["chr1 some description", "chr2"]
    assert [r.seq for r in back] == [r.seq for r in recs]
    assert back[0].id == "chr1"


def test_fasta_strips_interior_whitespace():
    # the reference panics on its own example file because seq_io keeps a
    # trailing space; we strip (documented divergence, io/fasta.py)
    recs = read_fasta(">x\nACGT ACGT\nAC GT\n")
    assert recs[0].seq == b"ACGTACGTACGT"


def test_matrix_csv_roundtrip(rng):
    m = rng.integers(-5, 12, (6, 7)).astype(np.float64)
    text = matrix_to_csv(m)
    back = matrix_from_csv(text)
    assert np.array_equal(m, back)
    # dim coercion pads/truncates like convert_csv_to_matrix
    padded = matrix_from_csv(text, dim=(8, 8))
    assert padded.shape == (8, 8)
    assert np.array_equal(padded[:6, :7], m)


def test_records_roundtrip(tmp_path):
    recs = [
        Record("chr1", 3.5, 10, 40),
        Record("chr1", 4.25, 100, 130),
        Record("chr2", 9.0, 0, 30),
    ]
    p = tmp_path / "out.csv"
    write_records(p, recs)
    back = read_records(p)
    assert set(back) == {"chr1", "chr2"}
    assert len(back["chr1"]) == 2
    assert back["chr2"][0].z_value == 9.0
    assert back["chr1"][1].right_coord == 130
