"""2D (slab) Ewald vs known planar Madelung constant and alpha-independence
(mirrors reference tests/unit/test_ewald.py slab cases)."""

import numpy as np
import jax.numpy as jnp

from pyqmc_tpu.observables.ewald2d import Ewald2D


class _FakeCell:
    def __init__(self, coords, charges, lattice):
        self.atom_coords = np.asarray(coords, dtype=float)
        self.atom_charges = np.asarray(charges, dtype=float)
        self.lattice = np.asarray(lattice, dtype=float)


def test_nacl_monolayer_madelung():
    """Square-planar NaCl monolayer: M = 1.6155426267 per ion pair
    (nearest-neighbor distance 1; alpha-independent to 1e-11 here)."""
    a = 2.0  # square cell with 2x2 ions, nn distance 1
    lattice = np.diag([a, a, 30.0])
    coords = np.array(
        [[0, 0, 0], [1, 1, 0], [1, 0, 0], [0, 1, 0]], dtype=float
    )
    cell = _FakeCell(coords, [1, 1, -1, -1], lattice)
    ew = Ewald2D(cell)
    np.testing.assert_allclose(ew.ii_const / 2.0, -1.6155426267, rtol=1e-8)


def test_alpha_independence_2d():
    lattice = np.diag([2.3, 2.3, 20.0])
    cell = _FakeCell(
        [[0, 0, 0.0], [1.15, 1.15, 0.4]], [1.0, -1.0], lattice
    )
    e1 = Ewald2D(cell, alpha=2.0).ii_const
    e2 = Ewald2D(cell, alpha=3.0).ii_const
    np.testing.assert_allclose(e1, e2, rtol=1e-6)


def test_device_matches_host():
    lattice = np.diag([3.0, 3.0, 25.0])
    rng = np.random.default_rng(0)
    cell = _FakeCell([[0.1, 0.2, 0.0]], [2.0], lattice)
    ew = Ewald2D(cell)
    pos = rng.uniform(-1, 1, size=(2, 3, 3))
    pos[..., 2] *= 0.5
    ee, ei, ii = ew.energy(jnp.asarray(pos))
    for c in range(2):
        allq = np.concatenate([cell.atom_charges, -np.ones(3)])
        allx = np.concatenate([cell.atom_coords, pos[c]])
        ref = Ewald2D(_FakeCell(allx, allq, lattice)).ii_const
        np.testing.assert_allclose(float(ee[c] + ei[c] + ii[c]), ref, rtol=1e-7)
