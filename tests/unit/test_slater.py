"""Slater wavefunction contract tests (mirrors tests/unit/test_wf_derivatives.py
of the reference for the Slater family)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
from pyqmc_tpu.models import testwf
from pyqmc_tpu.configs import initial_guess


@pytest.fixture(scope="module")
def h2o_mf():
    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867", basis="sto-3g"
    )
    return run_scf(mol)


@pytest.fixture(scope="module")
def li_mf():
    return run_scf(Molecule("Li 0 0 0", basis="sto-3g", spin=1))


def test_slater_rhf(h2o_mf):
    wf = Slater.from_mean_field(h2o_mf)
    params = wf.make_params()
    configs = initial_guess(h2o_mf.mol, 6, key=jax.random.PRNGKey(0))
    testwf.run_all(wf, params, configs, jax.random.PRNGKey(1))


def test_slater_open_shell(li_mf):
    wf = Slater.from_mean_field(li_mf)
    params = wf.make_params()
    configs = initial_guess(li_mf.mol, 6, key=jax.random.PRNGKey(2))
    testwf.run_all(wf, params, configs, jax.random.PRNGKey(3))


def test_multideterminant(h2o_mf):
    """Multi-det expansion with excitations, random det coefficients."""
    mol = h2o_mf.mol
    nup, ndn = mol.nelec
    norb = nup + 2
    ca = h2o_mf.mo_coeff[0][:, :norb]
    cb = h2o_mf.mo_coeff[1][:, :norb]
    # unique dets: ground, homo->lumo (up), homo->lumo+1 (dn)
    occ_up = np.array([list(range(nup)), list(range(nup - 1)) + [nup]])
    occ_dn = np.array([list(range(ndn)), list(range(ndn - 1)) + [ndn + 1]])
    map_up = np.array([0, 1, 0, 1])
    map_dn = np.array([0, 0, 1, 1])
    exp = DeterminantExpansion(occ_up, occ_dn, map_up, map_dn)
    det_coeff = np.array([0.9, 0.25, -0.2, 0.1])
    wf = Slater(mol, None, exp, (ca, cb), det_coeff)
    params = wf.make_params()
    configs = initial_guess(mol, 6, key=jax.random.PRNGKey(4))
    testwf.run_all(wf, params, configs, jax.random.PRNGKey(5))


def test_h_atom_no_dn_electrons():
    mf = run_scf(Molecule("H 0 0 0", basis="ccpvdz", spin=1))
    wf = Slater.from_mean_field(mf)
    params = wf.make_params()
    configs = initial_guess(mf.mol, 5, key=jax.random.PRNGKey(6))
    testwf.test_updateinternals(wf, params, configs, jax.random.PRNGKey(7))
    testwf.test_gradient(wf, params, configs, jax.random.PRNGKey(8))
    testwf.test_gradient_laplacian(wf, params, configs, jax.random.PRNGKey(9))


def test_testvalue_aux_all_matches_vmapped_testvalue(h2o_mf):
    """Slater.testvalue_aux_all (flat orbital pass + vmapped det-ratio
    contraction, the ECP quadrature fast path) equals per-electron
    testvalue."""
    wf = Slater.from_mean_field(h2o_mf)
    params = wf.make_params()
    configs = initial_guess(h2o_mf.mol, 12, key=jax.random.PRNGKey(3))
    pos = configs.positions
    state = wf.recompute(params, pos)
    nelec = wf.nelec
    rng = np.random.default_rng(5)
    aux = jnp.asarray(rng.normal(scale=1.2, size=(nelec, 12, 4, 3)))
    got = wf.testvalue_aux_all(params, state, aux)
    es = jnp.arange(nelec)
    ref = jax.vmap(lambda e, a: wf.testvalue(params, state, e, a)[0])(es, aux)
    assert got.shape == (nelec, 12, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)
