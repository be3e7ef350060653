"""Ewald vs known Madelung constants (mirrors reference tests/unit/test_ewald.py:37-197)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Cell
from pyqmc_tpu.observables.ewald import Ewald


class _FakeCell:
    def __init__(self, coords, charges, lattice):
        self.atom_coords = np.asarray(coords, dtype=float)
        self.atom_charges = np.asarray(charges, dtype=float)
        self.lattice = np.asarray(lattice, dtype=float)


def test_madelung_nacl():
    """Rock salt: E per formula unit = -M_NaCl / d_nn, M = 1.7475645946."""
    a = 2.0  # nearest-neighbor distance 1.0
    lattice = np.eye(3) * a
    # NaCl conventional cell: 4 Na + 4 Cl
    na = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    cl = np.array([[0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0.5]]) * a
    cell = _FakeCell(
        np.concatenate([na, cl]), [1, 1, 1, 1, -1, -1, -1, -1], lattice
    )
    ew = Ewald(cell)
    e_per_pair = ew.ii_const / 4.0
    np.testing.assert_allclose(e_per_pair, -1.7475645946, rtol=1e-8)


def test_madelung_cscl():
    """CsCl structure: M = 1.7626747731 (in units of nn distance)."""
    a = 1.0
    lattice = np.eye(3) * a
    d_nn = a * np.sqrt(3) / 2
    cell = _FakeCell([[0, 0, 0], [0.5, 0.5, 0.5]], [1, -1], lattice)
    ew = Ewald(cell)
    np.testing.assert_allclose(ew.ii_const, -1.7626747731 / d_nn, rtol=1e-8)


def test_alpha_independence():
    """Total must be independent of the splitting parameter."""
    lattice = np.array([[0, 1.7, 1.7], [1.7, 0, 1.7], [1.7, 1.7, 0]])
    cell = _FakeCell([[0, 0, 0], [0.85, 0.85, 0.85]], [2, -2], lattice)
    e1 = Ewald(cell, alpha=2.0).ii_const
    e2 = Ewald(cell, alpha=3.5).ii_const
    # per-term cutoffs are 1e-10; summed truncation error ~ 5e-8 relative
    np.testing.assert_allclose(e1, e2, rtol=2e-7)


def test_electron_terms_match_point_charges():
    """Placing 'electrons' at ion sites must reproduce point-charge sums."""
    lattice = np.eye(3) * 3.0
    # ions: +1 at corner; electron site at center
    cell = _FakeCell([[0.0, 0.0, 0.0]], [1.0], lattice)
    ew = Ewald(cell)
    pos = jnp.asarray(np.array([[[1.5, 1.5, 1.5]]]))  # (1 walker, 1 electron)
    ee, ei, ii = ew.energy(pos)
    # compare with a two-"ion" host computation (+1, -1)
    cell2 = _FakeCell([[0, 0, 0], [1.5, 1.5, 1.5]], [1.0, -1.0], lattice)
    ew2 = Ewald(cell2)
    total = float(ee[0] + ei[0] + ii[0])
    # electron self (xi/2) appears in ee even for one electron
    np.testing.assert_allclose(total, ew2.ii_const, rtol=1e-8)


def test_two_electrons_device_vs_host():
    lattice = np.array([[0, 2.1, 2.1], [2.1, 0, 2.1], [2.1, 2.1, 0]])
    rng = np.random.default_rng(5)
    coords = rng.uniform(0, 2, size=(2, 3))
    cell = _FakeCell(coords, [3.0, 1.0], lattice)
    ew = Ewald(cell)
    epos = rng.uniform(0, 2, size=(3, 4, 3))  # 3 walkers, 4 electrons
    ee, ei, ii = ew.energy(jnp.asarray(epos))
    # host reference: treat each walker's electrons as -1 charges
    for c in range(3):
        allq = np.concatenate([cell.atom_charges, -np.ones(4)])
        allx = np.concatenate([coords, epos[c]])
        ewc = Ewald(_FakeCell(allx, allq, lattice))
        np.testing.assert_allclose(
            float(ee[c] + ei[c] + ii[c]), ewc.ii_const, rtol=1e-7
        )
