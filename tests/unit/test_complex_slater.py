"""Molecular Slater with complex orbital coefficients: full wavefunction
contract (values, updates, derivatives incl. holomorphic pgradient with
imaginary-direction FD checks).

Parity: the reference exercises complex molecular coefficients in
tests/integration/test_complex_linemin.py:33-36 (mo_coeff * 1j + noise).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.models import testwf
from pyqmc_tpu.configs import initial_guess


@pytest.fixture(scope="module")
def h2_complex():
    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")
    mf = run_scf(mol)
    rng = np.random.default_rng(3)
    nup, ndn = mol.nelec
    ca = np.asarray(mf.mo_coeff[0][:, :nup])
    cb = np.asarray(mf.mo_coeff[1][:, :ndn])
    # rotate into the complex plane and break symmetry with noise, as the
    # reference test does
    ca = ca * np.exp(0.3j) + (rng.random(ca.shape) - 0.5) * 0.2j
    cb = cb * np.exp(-0.2j) + (rng.random(cb.shape) - 0.5) * 0.2j
    from pyqmc_tpu.models.slater import DeterminantExpansion

    wf = Slater(
        mol, None, DeterminantExpansion.single(nup, ndn),
        mo_coeff=(jnp.asarray(ca), jnp.asarray(cb)),
    )
    return mol, wf


def test_complex_slater_contract(h2_complex):
    mol, wf = h2_complex
    params = wf.make_params()
    assert jnp.iscomplexobj(params["mo_coeff_alpha"])
    configs = initial_guess(mol, 12, key=jax.random.PRNGKey(0))
    testwf.run_all(wf, params, configs, jax.random.PRNGKey(1))


def test_complex_slater_kinetic_imag(h2_complex):
    """A genuinely complex wavefunction must report a nonzero imaginary
    local kinetic energy per walker (zero only in expectation)."""
    from pyqmc_tpu.observables.energy import kinetic_energy

    mol, wf = h2_complex
    params = wf.make_params()
    configs = initial_guess(mol, 32, key=jax.random.PRNGKey(5))
    state = wf.recompute(params, configs.positions)
    ke, grad2, ke_im = kinetic_energy(
        wf, params, state, configs.positions, with_imag=True
    )
    assert np.all(np.isfinite(np.asarray(ke)))
    assert float(jnp.max(jnp.abs(ke_im))) > 1e-6
