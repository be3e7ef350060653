"""Multi-determinant pair-arithmetic Slater vs the complex reference path at
a general (non-TRIM) twist."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ..fixtures_pbc import load_cell
from pyqmc_tpu.system.supercell import get_supercell
from pyqmc_tpu.models.orbitals import KPointOrbitals
from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
from pyqmc_tpu.models.slater_pair import PairKSlater
from pyqmc_tpu.configs import initial_guess


@pytest.fixture(scope="module")
def multidet_twist():
    cell, d = load_cell("li_cubic_ccecp")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    kpts = np.asarray(d["kpts"]) + np.array([0.027, -0.011, 0.019])
    # two orbitals per k so excitations exist
    blocks = [np.asarray(d["mo_coeff"][k])[:, :2] for k in range(8)]
    orb = KPointOrbitals(cell, kpts, (blocks, blocks), realify=False)
    assert not orb.real_mode
    # multi-det: ground (orbitals 0,2,4,...,14) + an up excitation and a dn
    # excitation within the 16-orbital space
    ground = np.arange(0, 16, 2)
    exc = ground.copy(); exc[0] = 1
    occ_up = np.stack([ground, exc])
    occ_dn = np.stack([ground, exc])
    expn = DeterminantExpansion(
        occ_up=occ_up, occ_dn=occ_dn,
        map_up=np.array([0, 1, 0]), map_dn=np.array([0, 0, 1]),
    )
    coeff = np.array([0.9, 0.3, -0.2])
    wf_c = Slater(sup, orb, expn, det_coeff=coeff)
    wf_p = PairKSlater(sup, orb, expn, det_coeff=coeff)
    return sup, wf_c, wf_p


def test_pair_matches_complex(multidet_twist):
    sup, wf_c, wf_p = multidet_twist
    pc, pp = wf_c.make_params(), wf_p.make_params()
    configs = initial_guess(sup, 4, key=jax.random.PRNGKey(0))
    pos = configs.positions
    st_c = wf_c.recompute(pc, pos)
    st_p = wf_p.recompute(pp, pos)
    _, la_c = wf_c.value(pc, st_c)
    _, la_p = wf_p.value(pp, st_p)
    np.testing.assert_allclose(np.asarray(la_p), np.asarray(la_c), rtol=1e-9)
    key = jax.random.PRNGKey(1)
    for e in (0, 7, 8, 15):
        key, k1 = jax.random.split(key)
        epos = pos[:, e, :] + 0.6 * jax.random.normal(k1, (4, 3), pos.dtype)
        r_c, _ = wf_c.testvalue(pc, st_c, jnp.int32(e), epos)
        r_p, _ = wf_p.testvalue(pp, st_p, jnp.int32(e), epos)
        np.testing.assert_allclose(
            np.asarray(r_p), np.abs(np.asarray(r_c)), rtol=1e-8
        )
        g_c, l_c = wf_c.gradient_laplacian(pc, st_c, jnp.int32(e), epos)
        g_p, l_p = wf_p.gradient_laplacian(pp, st_p, jnp.int32(e), epos)
        np.testing.assert_allclose(
            np.asarray(g_p), np.real(np.asarray(g_c)), rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(l_p), np.real(np.asarray(l_c)), rtol=1e-6, atol=1e-9
        )
    many_p = wf_p.testvalue_many(pp, st_p, pos[:, 0, :])
    many_c = wf_c.testvalue_many(pc, st_c, pos[:, 0, :])
    # atol: coincident same-spin ratios are ~0 (Pauli), only roundoff differs
    np.testing.assert_allclose(
        np.asarray(many_p), np.abs(np.asarray(many_c)), rtol=1e-8, atol=1e-10
    )


def test_pair_updates(multidet_twist):
    sup, wf_c, wf_p = multidet_twist
    pp = wf_p.make_params()
    configs = initial_guess(sup, 4, key=jax.random.PRNGKey(2))
    pos = configs.positions
    st = wf_p.recompute(pp, pos)
    key = jax.random.PRNGKey(3)
    for e in range(0, 16, 5):
        key, k1, k2 = jax.random.split(key, 3)
        newpos = pos[:, e, :] + 0.5 * jax.random.normal(k1, (4, 3), pos.dtype)
        _, saved = wf_p.testvalue(pp, st, jnp.int32(e), newpos)
        mask = jax.random.uniform(k2, (4,)) > 0.4
        st = wf_p.updateinternals(pp, st, jnp.int32(e), newpos, mask, saved)
        pos = pos.at[:, e, :].set(jnp.where(mask[:, None], newpos, pos[:, e, :]))
    st_ref = wf_p.recompute(pp, pos)
    _, la = wf_p.value(pp, st)
    _, la_ref = wf_p.value(pp, st_ref)
    np.testing.assert_allclose(np.asarray(la), np.asarray(la_ref), atol=1e-8)


def test_pair_vmc_smoke(multidet_twist):
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.method.vmc import vmc

    sup, wf_c, wf_p = multidet_twist
    configs = initial_guess(sup, 24, key=jax.random.PRNGKey(4))
    data, _ = vmc(
        wf_p, wf_p.make_params(), configs, nblocks=3, nsteps_per_block=3,
        tstep=1.0, accumulators={"energy": EnergyAccumulator(sup)},
        key=jax.random.PRNGKey(5),
    )
    assert np.isfinite(data[-1]["energytotal"])


@pytest.mark.slow
def test_pair_det_coeff_optimization():
    """SR/linemin over determinant coefficients of a general-twist
    multi-det wavefunction (pair arithmetic); also regression-tests
    LinearTransform prefix-bool masks over list-valued subtrees."""
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.observables.transform import LinearTransform
    from pyqmc_tpu.method.linemin import line_minimization
    from pyqmc_tpu.method.vmc import vmc

    cell, d = load_cell("li_cubic_ccecp")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    kpts = np.asarray(d["kpts"]) + np.array([0.027, -0.011, 0.019])
    blocks = [np.asarray(d["mo_coeff"][k])[:, :2] for k in range(8)]
    orb = KPointOrbitals(cell, kpts, (blocks, blocks), realify=False)
    ground = np.arange(0, 16, 2)
    exc = ground.copy(); exc[0] = 1
    expn = DeterminantExpansion(
        np.stack([ground, exc]), np.stack([ground, exc]),
        np.array([0, 1, 0]), np.array([0, 0, 1]),
    )
    wf = PairKSlater(sup, orb, expn, det_coeff=np.array([0.6, 0.6, 0.5]))
    params = wf.make_params()
    lt = LinearTransform(params, {k: (k == "det_coeff") for k in params})
    assert lt.nparams == 3
    acc = EnergyAccumulator(sup)
    cfg = initial_guess(sup, 150, key=jax.random.PRNGKey(10))
    _, cfg = vmc(wf, params, cfg, nblocks=3, nsteps_per_block=8, tstep=1.0,
                 key=jax.random.PRNGKey(11))
    popt, cfg, recs = line_minimization(
        wf, params, cfg, lt, acc, key=jax.random.PRNGKey(12),
        max_iterations=5, vmc_blocks=4, vmc_tstep=1.0,
    )
    assert recs[-1]["energy"] < recs[0]["energy"] + 0.1
    c = np.asarray(popt["det_coeff"])
    assert c[0] > abs(c[1]) and c[0] > abs(c[2])  # ground det dominates


def test_pair_pgradient(multidet_twist):
    """Orbital + det_coeff pgradient: FD contract check plus a direct
    comparison against the complex path's holomorphic derivatives."""
    from pyqmc_tpu.models import testwf

    sup, wf_c, wf_p = multidet_twist
    configs = initial_guess(sup, 3, key=jax.random.PRNGKey(6))
    pp = wf_p.make_params()
    testwf.test_pgradient(wf_p, pp, configs, jax.random.PRNGKey(7), tol=1e-4)

    pc = wf_c.make_params()
    g_c = wf_c.pgradient(pc, configs.positions)
    g_p = wf_p.pgradient(pp, configs.positions)
    np.testing.assert_allclose(
        np.asarray(g_p["det_coeff"]), np.real(np.asarray(g_c["det_coeff"])),
        rtol=1e-8, atol=1e-10,
    )
    for tag, cname in (("alpha", "mo_coeff_alpha"), ("beta", "mo_coeff_beta")):
        for k in range(len(g_c[cname])):
            d = np.asarray(g_c[cname][k])
            np.testing.assert_allclose(
                np.asarray(g_p[f"mo_coeff_{tag}_re"][k]), np.real(d),
                rtol=1e-7, atol=1e-9,
            )
            np.testing.assert_allclose(
                np.asarray(g_p[f"mo_coeff_{tag}_im"][k]), -np.imag(d),
                rtol=1e-7, atol=1e-9,
            )
