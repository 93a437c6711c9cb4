import numpy as np
import pytest

from aligner_tpu.alphabet import (
    ANY,
    BLANK,
    DNA,
    POS,
    Index,
    Protein,
    index_coord,
    rotate_indices,
)
from aligner_tpu.errors import CharIsNotMatchable


def test_protein_codes_match_reference():
    # enums.rs:55-84: A..X = 0..23 in this exact order
    assert Protein.letters == "ARNDCQEGHILKMFPSTWYVBJZX"
    codes = Protein.encode("ARNDCQEGHILKMFPSTWYVBJZX")
    assert list(codes) == list(range(24))
    assert Protein.volume() == 24


def test_dna_codes_match_reference():
    # enums.rs:138-147: A=0 T=1 C=2 G=3
    assert list(DNA.encode("ATCG")) == [0, 1, 2, 3]
    assert DNA.volume() == 4


def test_specials_roundtrip():
    codes = Protein.encode("A_+")
    assert list(codes) == [0, BLANK, POS]
    assert Protein.decode(codes) == "A_+"
    assert Protein.decode(np.array([ANY])) == "*"


def test_protein_strict_raises():
    # enums.rs:292-303: Protein from_u8_vec errors on invalid chars
    with pytest.raises(CharIsNotMatchable):
        Protein.encode("AB1")


def test_dna_skips_silently():
    # enums.rs:454-467: DNA skips invalid chars
    assert list(DNA.encode("ANTNC")) == [0, 1, 2]


def test_encode_with_freqs():
    codes, freqs = DNA.encode_with_freqs("AATNNG")
    assert list(codes) == [0, 0, 1, 3]
    np.testing.assert_allclose(freqs, np.array([2, 1, 0, 1]) / 4.0)


def test_encode_with_freqs_and_indices():
    # raw: AA NN TT N G  -> compacted AATTG
    codes, freqs, idx = DNA.encode_with_freqs_and_indices("AANNTTNG")
    assert list(codes) == [0, 0, 1, 1, 3]
    # First run NN skipped before raw position 4 -> coord 4-2=2, offset 2,
    # local 2; second run N before raw position 7 -> coord 7-3=4, offset 3,
    # local 1.  Stored in descending coord order (enums.rs:359).
    assert idx == [
        Index(coord=4, offset=3, local_offset=1),
        Index(coord=2, offset=2, local_offset=2),
    ]
    np.testing.assert_allclose(freqs, np.array([2, 2, 0, 1]) / 5.0)


def test_index_coord():
    idx = [
        Index(coord=4, offset=3, local_offset=1),
        Index(coord=2, offset=2, local_offset=2),
    ]
    # engine/mod.rs:121-129: first (descending) index with target >= coord
    assert index_coord(0, idx) == 0
    assert index_coord(1, idx) == 1
    assert index_coord(2, idx) == 4
    assert index_coord(3, idx) == 5
    assert index_coord(4, idx) == 7
    assert index_coord(10, idx) == 13


def test_rotate_indices_roundtrip():
    # raw AANNTTNG (len 8), compacted AATTG (len 5); reversed raw GNTTNNAA
    # compacted reversed = GTTAA with indices derivable independently.
    _, _, idx = DNA.encode_with_freqs_and_indices("AANNTTNG")
    rotated = rotate_indices(idx, 5)
    _, _, expected = DNA.encode_with_freqs_and_indices("AANNTTNG"[::-1])
    assert rotated == expected


def test_random_seq_freqs_are_counts(rng):
    seq, counts = DNA.random_seq_with_freqs(100, rng)
    assert counts.sum() == 100  # reference returns counts, not frequencies
    assert len(seq) == 100
