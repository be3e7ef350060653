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


def test_pair_ecp_matches_complex(multidet_twist):
    """Multi-det pair path: ECP local energy must match the complex path
    per-walker (signed/phased ratios through testvalue_pair)."""
    from pyqmc_tpu.observables.ecp import ECPAccumulator

    sup, wf_c, wf_p = multidet_twist
    pc, pp = wf_c.make_params(), wf_p.make_params()
    configs = initial_guess(sup, 6, key=jax.random.PRNGKey(31))
    pos = configs.positions
    st_c = wf_c.recompute(pc, pos)
    st_p = wf_p.recompute(pp, pos)
    acc = ECPAccumulator(sup, naip=6)
    key = jax.random.PRNGKey(32)
    ec, ec_im = acc(wf_c, pc, st_c, pos, key, with_imag=True)
    ep, ep_im = acc(wf_p, pp, st_p, pos, key, with_imag=True)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(ec),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ep_im), np.asarray(ec_im),
                               rtol=1e-6, atol=1e-9)


def test_pair_imag_channels(multidet_twist):
    """Phase-channel parity with the complex path: Im(grad log Psi),
    Im(lap Psi/Psi), the full complex local energy E_I, and the
    phase-derivative pgradient tree (the inputs to the complex-parameter
    SR gradient on the real-only backend)."""
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator

    sup, wf_c, wf_p = multidet_twist
    pc, pp = wf_c.make_params(), wf_p.make_params()
    configs = initial_guess(sup, 4, key=jax.random.PRNGKey(41))
    pos = configs.positions
    st_c = wf_c.recompute(pc, pos)
    st_p = wf_p.recompute(pp, pos)
    for e in (0, 9):
        epos = pos[:, e, :]
        g_c, l_c = wf_c.gradient_laplacian(pc, st_c, jnp.int32(e), epos)
        gr, gi, lr, li = wf_p.gradient_laplacian_pair(
            pp, st_p, jnp.int32(e), epos
        )
        np.testing.assert_allclose(np.asarray(gi), np.imag(np.asarray(g_c)),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(li), np.imag(np.asarray(l_c)),
                                   rtol=1e-6, atol=1e-9)
    # full local energy, both channels
    acc = EnergyAccumulator(sup)
    key = jax.random.PRNGKey(42)
    d_c = acc(wf_c, pc, st_c, pos, key=key, with_imag=True)
    d_p = acc(wf_p, pp, st_p, pos, key=key, with_imag=True)
    np.testing.assert_allclose(np.asarray(d_p["total"]),
                               np.asarray(d_c["total"]), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(d_p["total_im"]),
                               np.asarray(d_c["total_im"]),
                               rtol=1e-6, atol=1e-9)
    assert np.max(np.abs(np.asarray(d_c["total_im"]))) > 1e-8
    # phase-derivative pgradient channel vs holomorphic complex derivatives
    g_c = wf_c.pgradient(pc, pos)
    _, g_im = wf_p.pgradient_pair(pp, pos)
    np.testing.assert_allclose(
        np.asarray(g_im["det_coeff"]), np.imag(np.asarray(g_c["det_coeff"])),
        rtol=1e-7, atol=1e-10,
    )
    for tag, cname in (("alpha", "mo_coeff_alpha"), ("beta", "mo_coeff_beta")):
        for k in range(len(g_c[cname])):
            d = np.asarray(g_c[cname][k])
            np.testing.assert_allclose(
                np.asarray(g_im[f"mo_coeff_{tag}_re"][k]), np.imag(d),
                rtol=1e-7, atol=1e-9,
            )
            np.testing.assert_allclose(
                np.asarray(g_im[f"mo_coeff_{tag}_im"][k]), np.real(d),
                rtol=1e-7, atol=1e-9,
            )


def test_pair_s2_matches_complex(multidet_twist):
    """S^2 exchange ratios need Re(r1 r2) with complex composition — the
    pair path must match the complex path per-walker."""
    from pyqmc_tpu.observables.s2 import S2Accumulator

    sup, wf_c, wf_p = multidet_twist
    pc, pp = wf_c.make_params(), wf_p.make_params()
    configs = initial_guess(sup, 4, key=jax.random.PRNGKey(61))
    pos = configs.positions
    st_c = wf_c.recompute(pc, pos)
    st_p = wf_p.recompute(pp, pos)
    acc = S2Accumulator(sup)
    s_c = acc(wf_c, pc, st_c, pos)["S2"]
    s_p = acc(wf_p, pp, st_p, pos)["S2"]
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_c),
                               rtol=1e-6, atol=1e-8)


def test_pair_kobdm_matches_complex(multidet_twist):
    """Periodic OBDM: the real-pair path (testvalue_many_pair + eval_pair)
    must reproduce the complex path per-walker."""
    from pyqmc_tpu.observables.obdm import KOBDMAccumulator

    sup, wf_c, wf_p = multidet_twist
    pc, pp = wf_c.make_params(), wf_p.make_params()
    configs = initial_guess(sup, 5, key=jax.random.PRNGKey(71))
    pos = configs.positions
    st_c = wf_c.recompute(pc, pos)
    st_p = wf_p.recompute(pp, pos)
    for spin in (0, 1):
        acc = KOBDMAccumulator(sup, wf_c.orbitals, spin=spin)
        key = jax.random.PRNGKey(72 + spin)
        d_c = acc(wf_c, pc, st_c, pos, key)
        d_p = acc(wf_p, pp, st_p, pos, key)
        np.testing.assert_allclose(
            np.asarray(d_p["value_re"]), np.asarray(d_c["value_re"]),
            rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(d_p["value_im"]), np.asarray(d_c["value_im"]),
            rtol=1e-6, atol=1e-9,
        )
        assert np.max(np.abs(np.asarray(d_c["value_im"]))) > 1e-10


def test_pair_ktbdm_matches_complex(multidet_twist):
    """Periodic TBDM: real-pair composition must reproduce the complex
    path per-walker, for same-spin and opposite-spin sectors."""
    from pyqmc_tpu.observables.tbdm import KTBDMAccumulator

    sup, wf_c, wf_p = multidet_twist
    pc, pp = wf_c.make_params(), wf_p.make_params()
    configs = initial_guess(sup, 3, key=jax.random.PRNGKey(81))
    pos = configs.positions
    st_c = wf_c.recompute(pc, pos)
    st_p = wf_p.recompute(pp, pos)
    for spin in ((0, 1), (0, 0)):
        acc = KTBDMAccumulator(sup, wf_c.orbitals, spin=spin)
        key = jax.random.PRNGKey(83)
        d_c = acc(wf_c, pc, st_c, pos, key)
        d_p = acc(wf_p, pp, st_p, pos, key)
        np.testing.assert_allclose(
            np.asarray(d_p["value_re"]), np.asarray(d_c["value_re"]),
            rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(d_p["value_im"]), np.asarray(d_c["value_im"]),
            rtol=1e-6, atol=1e-9,
        )


@pytest.mark.slow
def test_pair_orbital_optimization():
    """SR/linemin over det_coeff + ORBITAL coefficients of a general-twist
    multi-det wavefunction on the real-pair path: with the complex channel
    (E_I, phase pgradient) the direction is a descent direction — the
    energy must drop AND the parameters must actually move (regression for
    the tau=0-every-iteration failure mode of the real-only gradient)."""
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
    wf = PairKSlater(sup, orb, expn, det_coeff=np.array([0.8, 0.4, 0.4]))
    params = wf.make_params()
    to_opt = {k: (k in ("det_coeff", "mo_coeff_alpha_re", "mo_coeff_alpha_im"))
              for k in params}
    lt = LinearTransform(params, to_opt)
    acc = EnergyAccumulator(sup)
    cfg = initial_guess(sup, 150, key=jax.random.PRNGKey(10))
    _, cfg = vmc(wf, params, cfg, nblocks=3, nsteps_per_block=8, tstep=1.0,
                 key=jax.random.PRNGKey(11))
    x0 = np.asarray(lt.serialize(params))
    popt, cfg, recs = line_minimization(
        wf, params, cfg, lt, acc, key=jax.random.PRNGKey(12),
        max_iterations=4, vmc_blocks=4, vmc_tstep=1.0,
    )
    x1 = np.asarray(lt.serialize(popt))
    assert np.linalg.norm(x1 - x0) > 1e-3, "parameters never moved"
    assert recs[-1]["energy"] < recs[0]["energy"] - 0.1


def test_pair_symmetry_matches_complex(multidet_twist):
    """<S Psi/Psi> needs the wavefunction PHASE; PairKSlater supplies it
    through value_pair and must match the complex path per-walker."""
    from pyqmc_tpu.observables.symmetry import SymmetryAccumulator

    sup, wf_c, wf_p = multidet_twist
    pc, pp = wf_c.make_params(), wf_p.make_params()
    configs = initial_guess(sup, 4, key=jax.random.PRNGKey(91))
    pos = configs.positions
    st_c = wf_c.recompute(pc, pos)
    st_p = wf_p.recompute(pp, pos)
    ops = [-np.eye(3), np.array([[0, -1.0, 0], [1.0, 0, 0], [0, 0, 1.0]])]
    acc = SymmetryAccumulator(sup, ops, names=["inv", "c4z"])
    d_c = acc(wf_c, pc, st_c, pos)
    d_p = acc(wf_p, pp, st_p, pos)
    for name in ("inv", "c4z"):
        np.testing.assert_allclose(np.asarray(d_p[name]),
                                   np.asarray(d_c[name]),
                                   rtol=1e-6, atol=1e-9)
