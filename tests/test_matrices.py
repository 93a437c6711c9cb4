import numpy as np
import pytest

from aligner_tpu.alphabet import Protein
from aligner_tpu.errors import WrongMatrixSpecified
from aligner_tpu.matrices import (
    blosum50,
    blosum62,
    get_threshold,
    random_pwm,
    transform_matrix,
)


def idx(ch: str) -> int:
    return int(Protein.encode(ch)[0])


def test_blosum62_spot_values():
    m = blosum62()
    assert m.shape == (24, 24)
    assert m[idx("A"), idx("A")] == 4
    assert m[idx("W"), idx("W")] == 11
    assert m[idx("R"), idx("K")] == 2
    # reference quirk: labels J/Z/X carry standard Z/X/* columns (lib.rs:61-90)
    assert m[idx("J"), idx("J")] == 4
    assert m[idx("X"), idx("X")] == 1
    np.testing.assert_array_equal(m, m.T)


def test_blosum50_spot_values():
    m = blosum50()
    assert m[idx("A"), idx("A")] == 5
    assert m[idx("H"), idx("H")] == 10
    assert m[idx("W"), idx("W")] == 15
    assert m[idx("E"), idx("E")] == 6
    assert m[idx("P"), idx("H")] == -2
    assert m[idx("G"), idx("W")] == -3
    np.testing.assert_array_equal(m, m.T)


def test_get_threshold():
    assert get_threshold(24) == 24.6
    assert get_threshold(20) == 22.6
    assert get_threshold(7) == 0.0


def test_random_pwm(rng):
    m = random_pwm(300, rng)
    assert m.shape == (4, 300)
    assert set(np.unique(m)) <= {-1.0, 0.0, 1.0}


def test_transform_matrix_constraints(rng):
    """After projection: sum(p*M') == k_d and ||M'||^2 == r^2
    (matrices/mod.rs:19-68 algebra)."""
    for _ in range(10):
        m = rng.normal(size=(24, 24)) * 3
        freqs = rng.dirichlet(np.ones(24))
        k_d, r2 = 0.5, 210.0
        out = transform_matrix(m, k_d, r2, freqs)
        p = np.outer(freqs, np.full(24, 1 / 24))
        assert (p * out).sum() == pytest.approx(k_d, abs=1e-9)
        assert (out * out).sum() == pytest.approx(r2, rel=1e-9)


def test_transform_matrix_pwm_shape(rng):
    """The repeat-search call shape: (4, W) PWM, k_d=0, r2=del*ext
    (latent-repeat-search engine/calc.rs:156-164)."""
    m = random_pwm(300, rng)
    freqs = rng.dirichlet(np.ones(4))
    out = transform_matrix(m, 0.0, 30.0 * 7.0, freqs)
    assert out.shape == (4, 300)
    p = np.outer(freqs, np.full(300, 1 / 300))
    assert (p * out).sum() == pytest.approx(0.0, abs=1e-9)
    assert (out * out).sum() == pytest.approx(210.0, rel=1e-9)


def test_transform_matrix_no_roots():
    # r_squared below the minimum achievable norm -> negative discriminant
    m = np.eye(4)
    freqs = np.full(4, 0.25)
    with pytest.raises(WrongMatrixSpecified):
        transform_matrix(m, 5.0, 1e-6, freqs)
