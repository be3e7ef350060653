"""Three-body Jastrow contract tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.jastrow3 import ThreeBodyJastrow
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.models.multiply import MultiplyWF
from pyqmc_tpu.models import testwf
from pyqmc_tpu.configs import initial_guess


@pytest.fixture(scope="module")
def h2o_mf():
    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867", basis="sto-3g"
    )
    return run_scf(mol)


def test_three_body_contract(h2o_mf):
    mol = h2o_mf.mol
    wf = ThreeBodyJastrow(mol)
    params = wf.make_params()
    params["ccoeff"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(0), params["ccoeff"].shape
    )
    configs = initial_guess(mol, 5, key=jax.random.PRNGKey(1))
    testwf.run_all(wf, params, configs, jax.random.PRNGKey(2))


def test_pair_symmetry(h2o_mf):
    """U must be invariant under swapping two same-spin electrons."""
    mol = h2o_mf.mol
    wf = ThreeBodyJastrow(mol)
    params = {"ccoeff": 0.05 * jax.random.normal(
        jax.random.PRNGKey(3), wf.make_params()["ccoeff"].shape)}
    pos = jnp.asarray(
        np.random.default_rng(4).normal(scale=1.5, size=(7, wf.nelec, 3))
    )
    st = wf.recompute(params, pos)
    # swap up electrons 0 and 1
    pos2 = pos.at[:, [0, 1], :].set(pos[:, [1, 0], :])
    st2 = wf.recompute(params, pos2)
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(st2.u), rtol=1e-12)


def test_slater_j3_product(h2o_mf):
    slater = Slater.from_mean_field(h2o_mf)
    j3 = ThreeBodyJastrow(h2o_mf.mol)
    wf = MultiplyWF(slater, j3)
    params = wf.make_params()
    params["wf1"]["ccoeff"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(5), params["wf1"]["ccoeff"].shape
    )
    configs = initial_guess(h2o_mf.mol, 4, key=jax.random.PRNGKey(6))
    testwf.test_updateinternals(wf, params, configs, jax.random.PRNGKey(7))
    testwf.test_gradient_laplacian(wf, params, configs, jax.random.PRNGKey(8))
