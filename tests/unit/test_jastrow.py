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


def test_round_minimal_image_exact_below_cutoff():
    """The cheap rounding minimal image (Geometry.minimal_image_for) must
    agree with the exact 27-image search for every displacement whose true
    minimal distance is below half the min interplanar spacing; beyond
    that BOTH must be >= the bound (so cutoff-bounded bases are exact)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pyqmc_tpu.configs import Geometry

    # skewed fcc-like primitive lattice -> MODE_GENERAL
    a = 3.2
    lat = a * np.array([[0.0, 0.5, 0.5], [0.5, 0.0, 0.5], [0.5, 0.5, 0.0]])
    geom = Geometry(lat)
    assert geom.mode == "general"
    rp = geom.half_min_height()
    rmi = geom.minimal_image_for(rp)  # rounding kernel
    d = jax.random.normal(jax.random.PRNGKey(0), (4000, 3), jnp.float64) * (
        2.0 * a
    )
    exact = np.asarray(geom.minimal_image(jnp.asarray(d)))
    fast = np.asarray(rmi(jnp.asarray(d)))
    r_ex = np.linalg.norm(exact, axis=-1)
    r_fast = np.linalg.norm(fast, axis=-1)
    inside = r_ex < rp - 1e-12
    np.testing.assert_allclose(fast[inside], exact[inside], atol=1e-10)
    assert np.all(r_fast[~inside] >= rp - 1e-9)
    # above the bound the rounding kernel must NOT be used
    assert geom.minimal_image_for(rp * 1.5).__name__ != "round_mi"
    assert rmi.__name__ == "round_mi"


def test_jastrow_round_mi_matches_general(h2_mol=None):
    """JastrowSpin values/updates on a general lattice are identical with
    the rounding kernel and the forced 27-image kernel (default periodic
    rcut = half min height = the exactness bound)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pyqmc_tpu.system.mole import Cell
    from pyqmc_tpu.models.jastrow import JastrowSpin
    from pyqmc_tpu.wftools import default_jastrow_basis
    from pyqmc_tpu.configs import initial_guess

    a = 3.2
    lat = a * np.array([[0.0, 0.5, 0.5], [0.5, 0.0, 0.5], [0.5, 0.5, 0.0]])
    cell = Cell(
        [("H", np.zeros(3)), ("H", np.full(3, 0.8))],
        lattice=lat,
        basis={"H": [[0, [1.0, 1.0]]]},
    )
    ab, bb = default_jastrow_basis(cell)
    jas = JastrowSpin(cell, a_basis=ab, b_basis=bb)
    assert jas._mi.__name__ == "round_mi"  # rounding path chosen
    params = jax.tree.map(
        lambda x: x + 0.1, jas.make_params()
    )  # nonzero coefficients
    cfg = initial_guess(cell, 20, key=jax.random.PRNGKey(1))
    pos = cfg.positions
    st_fast = jas.recompute(params, pos)
    jas._mi = jas.geometry.minimal_image  # force exact 27-image search
    st_exact = jas.recompute(params, pos)
    np.testing.assert_allclose(
        np.asarray(st_fast.u), np.asarray(st_exact.u), rtol=1e-12
    )
