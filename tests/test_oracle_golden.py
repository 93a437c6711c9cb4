"""Golden tests pinning the oracle to the reference's only precomputed
fixtures (src/tests/test_alignment.rs) plus hand-derived aligner-core
semantics cases."""

import numpy as np

from aligner_tpu.alphabet import BLANK, Protein
from aligner_tpu.io.fasta import read_fasta_file
from aligner_tpu.matrices import blosum50
from aligner_tpu.oracle import (
    BEG,
    DIAG,
    LEFT,
    TOP,
    align_global,
    align_local,
    align_pwm,
    fill_global,
    legacy_global,
    legacy_local,
)

B, T, L, D = BEG, TOP, LEFT, DIAG

# src/tests/test_alignment.rs:13-24 — golden global DP matrix for
# HEAGAWGHEE vs PAWHEAE, BLOSUM50, del=8 (legacy single-penalty algorithm).
GOLDEN_GLOBAL = np.array(
    [
        [0, -8, -16, -24, -32, -40, -48, -56, -64, -72, -88],
        [-8, -2, -9, -17, -25, -33, -41, -49, -57, -65, -73],
        [-16, -10, -3, -4, -12, -20, -28, -36, -44, -52, -60],
        [-24, -18, -11, -6, -7, -15, -5, -13, -21, -29, -37],
        [-32, -14, -18, -13, -8, -9, -13, -7, -3, -11, -19],
        [-40, -22, -8, -16, -16, -9, -12, -15, -7, 3, -5],
        [-48, -30, -16, -3, -11, -11, -12, -12, -15, -5, 2],
        [-64, -38, -24, -11, -6, -12, -14, -15, -12, -9, 1],
    ]
)

GOLDEN_GLOBAL_DIR = np.array(
    [
        [B, L, L, L, L, L, L, L, L, L, L],
        [T, D, D, L, L, L, L, L, L, L, L],
        [T, T, D, D, L, L, L, L, L, L, L],
        [T, T, T, D, D, L, D, L, L, L, L],
        [T, D, D, D, D, D, T, D, D, L, L],
        [T, T, D, L, T, D, D, T, D, D, L],
        [T, T, T, D, L, D, D, D, T, T, D],
        [T, T, T, T, D, D, D, D, D, D, D],
    ]
)

# src/tests/test_alignment.rs:105-160 — golden local (clamped) matrix.
GOLDEN_LOCAL = np.array(
    [
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, 0, 5, 0, 5, 0, 0, 0, 0, 0],
        [0, 0, 0, 0, 2, 0, 20, 12, 4, 0, 0],
        [0, 10, 2, 0, 0, 0, 12, 18, 22, 14, 6],
        [0, 2, 16, 8, 0, 0, 4, 10, 18, 28, 20],
        [0, 0, 8, 21, 13, 5, 0, 4, 10, 20, 27],
        [0, 0, 6, 13, 18, 12, 4, 0, 4, 16, 26],
    ]
)

GOLDEN_LOCAL_DIR = np.array(
    [
        [B, B, B, B, B, B, B, B, B, B, B],
        [B, B, B, B, B, B, B, B, B, B, B],
        [B, B, B, D, B, D, B, B, B, B, B],
        [B, B, B, B, D, B, D, L, L, B, B],
        [B, D, L, B, B, B, T, D, D, L, L],
        [B, T, D, L, B, B, T, T, D, D, L],
        [B, B, T, D, L, L, B, D, T, T, D],
        [B, B, D, T, D, D, L, B, D, D, D],
    ]
)


def book_seqs():
    recs = read_fasta_file("examples/book_example_1.fasta")
    return Protein.encode(recs[0].seq), Protein.encode(recs[1].seq)


def s(codes) -> str:
    return Protein.decode(np.asarray(codes, dtype=np.int64))


def test_legacy_global_golden():
    q, t = book_seqs()
    a, d, qa, ta = legacy_global(q, t, blosum50(), 8)
    np.testing.assert_array_equal(a, GOLDEN_GLOBAL)
    np.testing.assert_array_equal(d, GOLDEN_GLOBAL_DIR)
    assert s(qa) == "HEAGAWGHE_E"
    assert s(ta) == "_PA__W_HEAE"


def test_legacy_local_golden():
    q, t = book_seqs()
    a, d, qa, ta = legacy_local(q, t, blosum50(), 8)
    np.testing.assert_array_equal(a, GOLDEN_LOCAL)
    np.testing.assert_array_equal(d, GOLDEN_LOCAL_DIR)
    assert a.max() == 28
    assert s(qa) == "AWGHE"
    assert s(ta) == "AW_HE"


def test_core_global_equals_legacy_fill_when_del_eq_ext():
    """With del == ext the aligner-core penalty state machine collapses to a
    constant penalty, so the fill must equal the legacy fill exactly —
    a strong cross-check of the state machinery."""
    q, t = book_seqs()
    a, d = fill_global(q, t, blosum50(), 8.0, 8.0)
    np.testing.assert_array_equal(a, GOLDEN_GLOBAL)
    np.testing.assert_array_equal(d, GOLDEN_GLOBAL_DIR)


def test_core_global_traceback_duplicates_seed():
    """aligner-core starts the walk at [T,Q] after seeding the last chars
    (simple/mod.rs:99-106), so a first diagonal step duplicates the seeded
    pair — derivable from the legacy golden walk."""
    q, t = book_seqs()
    res = align_global(q, t, blosum50(), 8.0, 8.0)
    assert s(res.query_aligned) == "HEAGAWGHE_EE"
    assert s(res.target_aligned) == "_PA__W_HEAEE"
    assert res.coords == ((1, 10), (1, 7))
    assert res.f == 0.0


def test_core_local_small_handcase():
    """Hand-computed aligner-core local case exercising the penalty state.

    q = 'AW', t = 'AW', BLOSUM50 (A-A=5, W-W=15, A-W=-3), del=8, ext=2.

    Fill order (x,y): (1,1): cands (-8,-8,5) -> 5 D, pen->2
    (1,2): top 5-2=3, left 0-2=-2, diag 0-3=-3 -> 3 T   (plane cell [2,1])
    (2,1): top 0-2=-2, left 5-2=3, diag 0-3=-3 -> 3 L   (plane cell [1,2])
    (2,2): top 3-2=1, left 3-2=1, diag 5+15=20 -> 20 D
    """
    q = Protein.encode("AW")
    res = align_local(q, q, blosum50(), 8.0, 2.0)
    np.testing.assert_array_equal(
        res.score, np.array([[0, 0, 0], [0, 5, 3], [0, 3, 20]])
    )
    np.testing.assert_array_equal(
        res.directions, np.array([[B, B, B], [B, D, L], [B, T, D]])
    )
    assert res.f == 20.0
    # argmax (2,2); seed (W,W); walk: D -> push (W,W) dup, move (1,1);
    # D -> push (A,A), move (0,0); BEG stop.
    assert s(res.query_aligned) == "AWW"
    assert s(res.target_aligned) == "AWW"
    assert res.coords == ((1, 3), (1, 3))


def test_core_local_penalty_column_head():
    """The penalty at a column head depends on the previous column's *bottom*
    cell (fill-order predecessor), q='WA', t='AW', del=8, ext=2.

    (1,1): cands(-8,-8,-3) -> -3 D (no clamp!), pen->2
    (1,2): top -3-2=-5, left -2, diag 0+15=15 -> 15 D, pen->2
    (2,1): top 0-2=-2, left -3-2=-5, diag 0+5... wait S(t1,q2)=S(A,A)=5 ->
           cands (-2, -5, 5) -> 5 D, pen->2
    (2,2): top 5-2=3, left 15-2=13, diag -3 + S(W,A)=-3-3=-6 -> 13 L
    """
    q = Protein.encode("WA")
    t = Protein.encode("AW")
    res = align_local(q, t, blosum50(), 8.0, 2.0)
    np.testing.assert_array_equal(
        res.score, np.array([[0, 0, 0], [0, -3, 5], [0, 15, 13]])
    )
    assert res.f == 15.0


def test_core_pwm_handcase():
    """PWM fill: rows = query, cols = PWM positions (pwm/mod.rs:44-74).

    q='AT' (codes 0,1), pwm=[[3,-1],[2,4],[-5,-5],[-5,-5]], del=8, ext=2:
    (1,1): cands(-8,-8, 0+3) -> 3 D, pen->2
    (1,2): top 3-2=1, left -2, diag 0 + M[A,1]=-1 -> 1 T
    (2,1): top -2, left 3-2=1, diag 0 + M[T,0]=2 -> 2 D
    (2,2): top 1-2=-1, left 2-2=0, diag 3 + M[T,1]=3+4=7 -> 7 D
    """
    pwm = np.array([[3.0, -1.0], [2.0, 4.0], [-5, -5], [-5, -5]])
    from aligner_tpu.alphabet import DNA

    q = DNA.encode("AT")
    res = align_pwm(q, pwm, 8.0, 2.0)
    np.testing.assert_array_equal(
        res.score, np.array([[0, 0, 0], [0, 3, 1], [0, 2, 7]])
    )
    assert res.f == 7.0
    # argmax (2,2): walk D -> push (2, T) move (1,1); D -> push (1, A); BEG.
    # (no seed duplication in the PWM walk, pwm/mod.rs:77-79)
    assert list(res.target_aligned) == [1, 2]
    assert DNA.decode(res.query_aligned) == "AT"
    assert res.coords == ((1, 3), (1, 3))
