"""Jastrow + product-wf contract tests (cf. reference test_wf_derivatives)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.models.jastrow import JastrowSpin
from pyqmc_tpu.models.multiply import MultiplyWF
from pyqmc_tpu.models import testwf, func3d
from pyqmc_tpu.configs import initial_guess


@pytest.fixture(scope="module")
def h2o_mf():
    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867", basis="sto-3g"
    )
    return run_scf(mol)


def _rand_jastrow_params(wf, key):
    p = wf.make_params()
    k1, k2 = jax.random.split(key)
    p["acoeff"] = p["acoeff"] + 0.05 * jax.random.normal(k1, p["acoeff"].shape)
    p["bcoeff"] = p["bcoeff"] + 0.05 * jax.random.normal(k2, p["bcoeff"].shape)
    return p


def test_func3d_derivatives():
    """value/grad/lap consistency for each basis function (func3d.py:213-285)."""
    r = jnp.linspace(0.01, 8.0, 300)
    delta = 1e-6
    for b in func3d.default_ee_basis() + func3d.default_ei_basis():
        v, fr, lp = func3d.eval_basis_all((b,), r)
        vp = func3d.eval_basis_value((b,), r + delta)
        vm = func3d.eval_basis_value((b,), r - delta)
        fd_fp = (vp - vm)[:, 0] / (2 * delta)
        np.testing.assert_allclose(fr[:, 0] * r, fd_fp, atol=1e-7)
        fd_lap = (vp + vm - 2 * v)[:, 0] / delta**2 + 2 * fd_fp / r
        np.testing.assert_allclose(lp[:, 0], fd_lap, atol=2e-3)


def test_cusp_condition():
    """cutoffcusp has unit derivative at r=0."""
    r = jnp.asarray([1e-5])
    b = (func3d.BasisFn("cutoffcusp", 24.0, 7.5),)
    v0 = func3d.eval_basis_value(b, jnp.asarray([0.0]))
    v1 = func3d.eval_basis_value(b, r)
    np.testing.assert_allclose((v1 - v0)[0, 0] / 1e-5, 1.0, rtol=1e-4)


def test_jastrow_contract(h2o_mf):
    wf = JastrowSpin(h2o_mf.mol)
    params = _rand_jastrow_params(wf, jax.random.PRNGKey(0))
    configs = initial_guess(h2o_mf.mol, 6, key=jax.random.PRNGKey(1))
    testwf.run_all(wf, params, configs, jax.random.PRNGKey(2))


def test_slater_jastrow_product(h2o_mf):
    slater = Slater.from_mean_field(h2o_mf)
    jastrow = JastrowSpin(h2o_mf.mol)
    wf = MultiplyWF(slater, jastrow)
    params = wf.make_params()
    params["wf1"] = _rand_jastrow_params(jastrow, jax.random.PRNGKey(3))
    configs = initial_guess(h2o_mf.mol, 5, key=jax.random.PRNGKey(4))
    testwf.run_all(wf, params, configs, jax.random.PRNGKey(5))
