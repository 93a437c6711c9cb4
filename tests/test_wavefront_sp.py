"""Cross-chip sequence-parallel wavefront (parallel/wavefront_sp.py):
bit-parity with the oracle on the 8-virtual-device mesh.

This is the SURVEY §7a capability — one huge global pair tiled across
chips with boundary halo exchange over the mesh (ppermute pipeline).
"""

from __future__ import annotations

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import aligner_tpu as at
from aligner_tpu import host
from aligner_tpu.parallel.wavefront_sp import sharded_global_end_score


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()).reshape(-1), ("data",))


@pytest.mark.parametrize("engine", ["lax", "pallas"])
def test_parity_vs_oracle(mesh, rng, engine):
    M = np.asarray(at.blosum62())
    for C, R in [(1000, 700), (333, 190), (1024, 257)]:
        q = rng.integers(0, 24, C).astype(np.int8)
        t = rng.integers(0, 24, R).astype(np.int8)
        ref = host.align_global(q, t, M, 11.0, 2.0)
        end = sharded_global_end_score(mesh, q, t, M, 11.0, 2.0, tr=64,
                                       engine=engine)
        assert end == ref.score[R, C]


def test_degenerate_shapes(mesh, rng):
    """Narrower than the device count (idle devices), single row-block,
    and block-boundary-straddling shapes."""
    M = np.asarray(at.blosum62())
    for C, R in [(7, 500), (64, 64), (129, 65), (8, 8)]:
        q = rng.integers(0, 24, C).astype(np.int8)
        t = rng.integers(0, 24, R).astype(np.int8)
        ref = host.align_global(q, t, M, 7.0, 3.0)
        end = sharded_global_end_score(mesh, q, t, M, 7.0, 3.0, tr=32)
        assert end == ref.score[R, C]


def test_matches_single_chip_wavefront(mesh, rng):
    from aligner_tpu.ops.wavefront import fill_single_global

    M = np.asarray(at.blosum62())
    q = rng.integers(0, 24, 300).astype(np.int8)
    t = rng.integers(0, 24, 450).astype(np.int8)
    end_sp = sharded_global_end_score(mesh, q, t, M, 11.0, 2.0)
    end_1, _ = fill_single_global(q, t, M, 11.0, 2.0, with_dirs=False,
                                  interpret=True)
    assert end_sp == end_1


def test_non_integral_rejected(mesh):
    with pytest.raises(ValueError):
        sharded_global_end_score(
            mesh, np.zeros(8, np.int8), np.zeros(8, np.int8),
            np.full((24, 24), 0.5), 11.0, 2.0,
        )


def test_pallas_engine_narrow_and_idle_devices(mesh, rng):
    """Pallas block engine with fully-padded devices and a single
    row-block."""
    M = np.asarray(at.blosum62())
    for C, R in [(100, 500), (64, 64)]:
        q = rng.integers(0, 24, C).astype(np.int8)
        t = rng.integers(0, 24, R).astype(np.int8)
        ref = host.align_global(q, t, M, 7.0, 3.0)
        end = sharded_global_end_score(mesh, q, t, M, 7.0, 3.0, tr=32,
                                       engine="pallas")
        assert end == ref.score[R, C]


@pytest.mark.tpu
def test_pallas_engine_hardware_spot(rng):
    """Mosaic lowering of the column-sharded block kernel on real
    hardware (1-device mesh — the pipeline and kernel are identical
    to the n-device case)."""
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    M = np.asarray(at.blosum62())
    q = rng.integers(0, 24, 700).astype(np.int8)
    t = rng.integers(0, 24, 900).astype(np.int8)
    ref = host.align_global(q, t, M, 11.0, 2.0)
    end = sharded_global_end_score(mesh1, q, t, M, 11.0, 2.0, tr=128,
                                   engine="pallas", interpret=False)
    assert end == ref.score[900, 700]


def test_pallas_engine_wide_entry_matrix_falls_back(mesh, rng):
    """Integral matrices beyond int8 cannot use the packed-byte pallas
    engine — it must fall back to the lax fill, not corrupt scores."""
    M = rng.integers(-200, 200, (24, 24)).astype(np.float64)
    q = rng.integers(0, 24, 300).astype(np.int8)
    t = rng.integers(0, 24, 200).astype(np.int8)
    ref = host.align_global(q, t, M, 11.0, 2.0)
    end = sharded_global_end_score(mesh, q, t, M, 11.0, 2.0,
                                   engine="pallas")
    assert end == ref.score[200, 300]
