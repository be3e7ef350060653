"""AddWF, Geminal/GPS Jastrows, variance optimization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
from pyqmc_tpu.models.addwf import AddWF
from pyqmc_tpu.models.generic_jastrow import GeminalJastrow, GPSJastrow
from pyqmc_tpu.models.multiply import MultiplyWF
from pyqmc_tpu.models import testwf
from pyqmc_tpu.configs import initial_guess


@pytest.fixture(scope="module")
def h2_mf():
    return run_scf(Molecule("H 0 0 0; H 0 0 1.4", basis="ccpvdz"))


def _two_state_wfs(mf):
    mol = mf.mol
    gs = Slater.from_mean_field(mf)
    # excited: HOMO->LUMO on both spins via multi-orbital coefficients
    ca = mf.mo_coeff[0][:, :2]
    ex = Slater(
        mol, None,
        DeterminantExpansion(
            occ_up=np.array([[1]]), occ_dn=np.array([[0]]),
            map_up=np.zeros(1, dtype=np.int64), map_dn=np.zeros(1, dtype=np.int64),
        ),
        (ca, ca),
    )
    return gs, ex


def test_addwf_contract(h2_mf):
    gs, ex = _two_state_wfs(h2_mf)
    wf = AddWF(gs, ex)
    params = wf.make_params()
    params["coeff"] = jnp.asarray([0.9, 0.35])
    configs = initial_guess(h2_mf.mol, 6, key=jax.random.PRNGKey(0))
    testwf.test_updateinternals(wf, params, configs, jax.random.PRNGKey(1))
    testwf.test_testvalue(wf, params, configs, jax.random.PRNGKey(2))
    testwf.test_testvalue_many(wf, params, configs, jax.random.PRNGKey(3))
    testwf.test_gradient(wf, params, configs, jax.random.PRNGKey(4))
    testwf.test_gradient_laplacian(wf, params, configs, jax.random.PRNGKey(5))


def test_geminal_contract(h2_mf):
    mol = h2_mf.mol
    wf = GeminalJastrow(mol)
    params = wf.make_params()
    params["gcoeff"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(6), params["gcoeff"].shape
    )
    configs = initial_guess(mol, 5, key=jax.random.PRNGKey(7))
    testwf.run_all(wf, params, configs, jax.random.PRNGKey(8))


def test_gps_contract(h2_mf):
    mol = h2_mf.mol
    wf = GPSJastrow(mol, n_support=3)
    params = wf.make_params()
    params["alpha"] = 0.05 * jax.random.normal(jax.random.PRNGKey(9), (3,))
    configs = initial_guess(mol, 5, key=jax.random.PRNGKey(10))
    testwf.run_all(wf, params, configs, jax.random.PRNGKey(11))


def test_optvariance(h2_mf):
    from pyqmc_tpu.models.jastrow import JastrowSpin
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.observables.transform import LinearTransform
    from pyqmc_tpu.method.optvariance import optvariance
    from pyqmc_tpu.method.vmc import vmc

    mol = h2_mf.mol
    wf = MultiplyWF(Slater.from_mean_field(h2_mf), JastrowSpin(mol))
    params = wf.make_params()
    configs = initial_guess(mol, 200, key=jax.random.PRNGKey(12))
    _, configs = vmc(wf, params, configs, nblocks=3, nsteps_per_block=10,
                     key=jax.random.PRNGKey(13))
    bmask = np.zeros((len(wf.wfs[1].b_basis), 3), dtype=bool)
    bmask[1:] = True
    lt = LinearTransform(params, {
        "wf0": {"det_coeff": False, "mo_coeff_alpha": False, "mo_coeff_beta": False},
        "wf1": {"acoeff": True, "bcoeff": bmask},
    })
    acc = EnergyAccumulator(mol)
    state = wf.recompute(params, configs.positions)
    var0 = float(np.var(np.asarray(
        acc(wf, params, state, configs.positions)["total"])))
    varf, params2 = optvariance(
        acc, wf, params, configs, lt, options={"maxiter": 30},
    )
    assert varf <= var0 + 1e-9, (varf, var0)


def test_geminal_periodic_contract():
    """Periodic geminal Jastrow: gamma-point supercell AO features are
    lattice-periodic and the wavefunction passes the full contract harness
    on a PBC cell (reference geminaljastrow.py:259-283 role)."""
    from ..fixtures_pbc import load_cell

    cell, d = load_cell("h_pbc_casscf")
    wf = GeminalJastrow(cell)
    params = wf.make_params()
    params["gcoeff"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(16), params["gcoeff"].shape
    )
    # feature map is periodic: chi(r + A) == chi(r)
    X = jax.random.normal(jax.random.PRNGKey(17), (6, 3))
    f0 = wf.features(params, X)
    for a in np.asarray(cell.lattice):
        np.testing.assert_allclose(
            wf.features(params, X + a[None]), f0, rtol=1e-9, atol=1e-11
        )
    configs = initial_guess(cell, 5, key=jax.random.PRNGKey(18))
    testwf.run_all(wf, params, configs, jax.random.PRNGKey(19))


def test_geminal_periodic_vmc_smoke():
    """Slater x periodic geminal composes and samples on a cell."""
    from ..fixtures_pbc import load_cell
    from pyqmc_tpu.models.orbitals import KPointOrbitals
    from pyqmc_tpu.method.vmc import vmc
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator

    cell, d = load_cell("h_pbc_casscf")
    nocc = int(np.sum(np.asarray(d["mo_occ"]) > 0.5))
    C = np.asarray(d["mo_coeff"])[:, :nocc].astype(np.complex128)
    orb = KPointOrbitals(cell, np.zeros((1, 3)), ([C], [C]))
    from pyqmc_tpu.models.slater import DeterminantExpansion

    slater = Slater(cell, orb, DeterminantExpansion.single(nocc, nocc))
    gem = GeminalJastrow(cell)
    wf = MultiplyWF(slater, gem)
    params = wf.make_params()
    params["wf1"]["gcoeff"] = 0.01 * jax.random.normal(
        jax.random.PRNGKey(20), (gem.nao, gem.nao)
    )
    configs = initial_guess(cell, 8, key=jax.random.PRNGKey(21))
    data, _ = vmc(
        wf, params, configs, nblocks=2, nsteps_per_block=3,
        accumulators={"energy": EnergyAccumulator(cell)},
        key=jax.random.PRNGKey(22),
    )
    assert np.isfinite(float(data[-1]["energytotal"]))
