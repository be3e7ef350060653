"""Periodic-boundary wavefunctions: gamma-point and k-point Slater against
the extracted reference SCF fixtures (mirrors reference
tests/integration/test_periodic.py:31-70 strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.configs import Configs, Geometry, initial_guess
from pyqmc_tpu.models.orbitals import KPointOrbitals
from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
from pyqmc_tpu.models import testwf
from pyqmc_tpu.system.supercell import (
    get_supercell,
    get_supercell_kpts,
    create_supercell_twists,
    primitive_translations,
)
from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system import integrals
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.method.vmc import vmc

from ..fixtures_pbc import load_cell


@pytest.fixture(scope="module")
def h2_pbc():
    cell, d = load_cell("h_pbc_casscf")
    nocc = int(np.sum(np.asarray(d["mo_occ"]) > 0.5))
    C = np.asarray(d["mo_coeff"])[:, :nocc].astype(np.complex128)
    orb = KPointOrbitals(cell, np.zeros((1, 3)), ([C], [C]))
    exp = DeterminantExpansion.single(nocc, nocc)
    wf = Slater(cell, orb, exp)
    return cell, wf, d


def test_gamma_point_contract(h2_pbc):
    cell, wf, d = h2_pbc
    configs = initial_guess(cell, 5, key=jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    testwf.test_updateinternals(wf, wf.make_params(), configs, key)
    testwf.test_testvalue(wf, wf.make_params(), configs, key)
    testwf.test_gradient(wf, wf.make_params(), configs, key)
    testwf.test_gradient_laplacian(wf, wf.make_params(), configs, key)


def periodic_kinetic(cell, images):
    """(S, T)^gamma[mu,nu] = sum_L M(chi_mu, chi_nu(.-L)) via a replicated
    molecule (self-contained counterpart of pyscf int1e_kin for k=0).

    The bra block must be the HOME cell's AOs: select_pbc_images returns
    meshgrid order, so images[0] is a far corner, not L=0 — anchoring the
    lattice sum there silently skews the truncated sum (a ~4% kinetic
    error that once hid in this test's tolerance)."""
    base_atoms = list(zip(cell.atom_symbols, cell.atom_coords))
    atoms = []
    for L in images:
        for s, c in base_atoms:
            atoms.append((s, np.asarray(c) + L))
    big = Molecule(
        atoms, basis={el: cell.basis[el] for el in set(cell.atom_symbols)},
        spin=None if (len(images) * sum(cell.nelec)) % 2 == 0 else 1,
    )
    # force electron bookkeeping irrelevant; we only need integrals
    S, T = integrals.overlap_kinetic(big)
    nao = cell.nao
    i0 = int(np.argmin(np.linalg.norm(np.asarray(images), axis=1)))
    rows = slice(i0 * nao, (i0 + 1) * nao)
    Tper = sum(T[rows, i * nao : (i + 1) * nao] for i in range(len(images)))
    Sper = sum(S[rows, i * nao : (i + 1) * nao] for i in range(len(images)))
    return Sper, Tper


def test_pbc_kinetic_vs_integrals(h2_pbc):
    """VMC kinetic energy of the gamma Slater must match the deterministic
    determinant expectation sum_occ <psi|T|psi> (test_periodic.py:31-70)."""
    cell, wf, d = h2_pbc
    # deterministic value from lattice-summed kinetic integrals, with the
    # S-normalization of the truncated Bloch AOs made explicit (the fixture
    # MO is pyscf-normalized; under OUR image sum C^T S C = 1 - 2e-6)
    imgs = wf.orbitals.images
    Sper, Tper = periodic_kinetic(cell, imgs)
    nocc = int(np.sum(np.asarray(d["mo_occ"]) > 0.5))
    C = np.real(np.asarray(d["mo_coeff"])[:, :nocc])
    ke_det = 2.0 * np.trace(
        np.linalg.solve(C.T @ Sper @ C, C.T @ Tper @ C)
    )  # both spins
    configs = initial_guess(cell, 400, key=jax.random.PRNGKey(2))
    data, _ = vmc(
        wf, wf.make_params(), configs, nblocks=25, nsteps_per_block=10,
        tstep=1.2, accumulators={"energy": EnergyAccumulator(cell)},
        key=jax.random.PRNGKey(3),
    )
    ke = np.array([dd["energyke"] for dd in data[8:]])
    mean, sem = ke.mean(), ke.std(ddof=1) / np.sqrt(len(ke))
    assert abs(mean - ke_det) < 5 * max(sem, 1e-3), (mean, ke_det, sem)


def test_supercell_translations():
    S = 2 * np.eye(3, dtype=int)
    t = primitive_translations(S)
    assert len(t) == 8
    S2 = np.array([[1, 1, 0], [1, -1, 0], [0, 0, 2]])
    assert len(primitive_translations(S2)) == abs(round(np.linalg.det(S2)))


def test_twist_grouping():
    cell, d = load_cell("li_cubic_ccecp")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    assert sup.natom == 16
    twists = create_supercell_twists(sup, d["kpts"])
    # 2x2x2 mesh folds entirely onto the gamma twist of the 2x supercell
    assert len(twists) == 1
    idx = list(twists.values())[0]
    assert len(idx) == 8
    idx2, tc = get_supercell_kpts(sup, d["kpts"], twist=None)
    assert len(idx2) == 8


def test_kpoint_slater_contract():
    """Complex 8-kpoint Slater on the Li supercell: full consistency sweep."""
    cell, d = load_cell("li_cubic_ccecp")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    kpts = np.asarray(d["kpts"])
    blocks = [np.asarray(d["mo_coeff"][k])[:, :1] for k in range(8)]
    orb = KPointOrbitals(cell, kpts, (blocks, blocks))
    assert orb.norb == (8, 8)
    exp = DeterminantExpansion.single(8, 8)
    wf = Slater(sup, orb, exp)
    configs = initial_guess(sup, 3, key=jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(5)
    params = wf.make_params()
    testwf.test_updateinternals(wf, params, configs, key, tol=1e-8)
    testwf.test_testvalue(wf, params, configs, key, tol=1e-8)
    testwf.test_gradient(wf, params, configs, key)
    testwf.test_gradient_laplacian(wf, params, configs, key)


def test_bloch_phase_continuity():
    """Value must be continuous when an electron crosses the cell boundary:
    psi(folded r, updated wrap) == psi(raw r)."""
    cell, d = load_cell("li_cubic_ccecp")
    kpts = np.asarray(d["kpts"])
    blocks = [np.asarray(d["mo_coeff"][k])[:, :1] for k in range(8)]
    orb = KPointOrbitals(cell, kpts, (blocks, blocks))
    params = {"mo_coeff_alpha": [jnp.asarray(b) for b in blocks],
              "mo_coeff_beta": [jnp.asarray(b) for b in blocks]}
    rng = np.random.default_rng(6)
    X = jnp.asarray(rng.uniform(0, 13.26, size=(10, 3)))
    lat = jnp.asarray(cell.lattice)
    mo1, _ = orb.eval(params, X, 0)
    mo2, _ = orb.eval(params, X + lat[0] + 2 * lat[2], 0)
    # Bloch: psi_k(r + L) = e^{i k.L} psi_k(r); orbitals are k-major with 1
    # orbital per k here
    phases = np.exp(1j * kpts @ np.asarray(lat[0] + 2 * lat[2]))
    np.testing.assert_allclose(
        np.asarray(mo2), np.asarray(mo1) * phases[None, :], rtol=1e-8, atol=1e-10
    )
