"""Real-embedded general-twist Slater vs the complex reference path.

The embedded determinant must reproduce log|Psi|, |ratio|, Re(grad log Psi)
and Re(lap Psi/Psi) of the complex k-point Slater at a NON-TRIM twist, and
its Sherman-Morrison updates must track full recomputes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ..fixtures_pbc import load_cell
from pyqmc_tpu.system.supercell import get_supercell
from pyqmc_tpu.models.orbitals import KPointOrbitals
from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
from pyqmc_tpu.models.slater_embedded import EmbeddedKSlater
from pyqmc_tpu.configs import initial_guess


@pytest.fixture(scope="module")
def general_twist_setup():
    cell, d = load_cell("li_cubic_ccecp")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    # shift the mesh by a generic twist -> NOT time-reversal invariant
    kpts = np.asarray(d["kpts"]) + np.array([0.031, 0.017, -0.043])
    blocks = [np.asarray(d["mo_coeff"][k])[:, :1] for k in range(8)]
    orb_c = KPointOrbitals(cell, kpts, (blocks, blocks), realify=False)
    assert not orb_c.real_mode
    wf_c = Slater(sup, orb_c, DeterminantExpansion.single(8, 8))
    wf_e = EmbeddedKSlater(sup, orb_c)
    return sup, wf_c, wf_e


def test_embedded_matches_complex(general_twist_setup):
    sup, wf_c, wf_e = general_twist_setup
    pc = wf_c.make_params()
    pe = wf_e.make_params()
    configs = initial_guess(sup, 4, key=jax.random.PRNGKey(0))
    pos = configs.positions
    st_c = wf_c.recompute(pc, pos)
    st_e = wf_e.recompute(pe, pos)
    ph_c, la_c = wf_c.value(pc, st_c)
    _, la_e = wf_e.value(pe, st_e)
    np.testing.assert_allclose(np.asarray(la_e), np.asarray(la_c), rtol=1e-9)

    key = jax.random.PRNGKey(1)
    for e in (0, 5, 9, 15):
        key, k1 = jax.random.split(key)
        epos = pos[:, e, :] + 0.7 * jax.random.normal(k1, (4, 3), pos.dtype)
        r_c, _ = wf_c.testvalue(pc, st_c, jnp.int32(e), epos)
        r_e, _ = wf_e.testvalue(pe, st_e, jnp.int32(e), epos)
        np.testing.assert_allclose(
            np.asarray(r_e), np.abs(np.asarray(r_c)), rtol=1e-9
        )
        g_c, lap_c = wf_c.gradient_laplacian(pc, st_c, jnp.int32(e), epos)
        g_e, lap_e = wf_e.gradient_laplacian(pe, st_e, jnp.int32(e), epos)
        np.testing.assert_allclose(
            np.asarray(g_e), np.real(np.asarray(g_c)), rtol=1e-7, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(lap_e), np.real(np.asarray(lap_c)), rtol=1e-7, atol=1e-10
        )


def test_embedded_updates(general_twist_setup):
    sup, wf_c, wf_e = general_twist_setup
    pe = wf_e.make_params()
    configs = initial_guess(sup, 4, key=jax.random.PRNGKey(2))
    pos = configs.positions
    st = wf_e.recompute(pe, pos)
    key = jax.random.PRNGKey(3)
    for e in range(0, 16, 3):
        key, k1, k2 = jax.random.split(key, 3)
        newpos = pos[:, e, :] + 0.5 * jax.random.normal(k1, (4, 3), pos.dtype)
        _, saved = wf_e.testvalue(pe, st, jnp.int32(e), newpos)
        mask = jax.random.uniform(k2, (4,)) > 0.4
        st = wf_e.updateinternals(pe, st, jnp.int32(e), newpos, mask, saved)
        pos = pos.at[:, e, :].set(jnp.where(mask[:, None], newpos, pos[:, e, :]))
    st_ref = wf_e.recompute(pe, pos)
    _, la = wf_e.value(pe, st)
    _, la_ref = wf_e.value(pe, st_ref)
    np.testing.assert_allclose(np.asarray(la), np.asarray(la_ref), atol=1e-8)


def test_embedded_vmc_smoke(general_twist_setup):
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.method.vmc import vmc

    sup, wf_c, wf_e = general_twist_setup
    configs = initial_guess(sup, 32, key=jax.random.PRNGKey(4))
    data, _ = vmc(
        wf_e, wf_e.make_params(), configs, nblocks=3, nsteps_per_block=4,
        tstep=1.0, accumulators={"energy": EnergyAccumulator(sup)},
        key=jax.random.PRNGKey(5),
    )
    assert np.isfinite(data[-1]["energytotal"])
    assert 0.1 < data[-1]["acceptance"] <= 1.0


def test_embedded_pgradient(general_twist_setup):
    """Orbital pgradient on the embedded path: FD contract check plus a
    direct comparison against the complex path's holomorphic derivative."""
    from pyqmc_tpu.models import testwf

    sup, wf_c, wf_e = general_twist_setup
    configs = initial_guess(sup, 3, key=jax.random.PRNGKey(8))
    pe = wf_e.make_params()
    testwf.test_pgradient(wf_e, pe, configs, jax.random.PRNGKey(9), tol=1e-4)

    pc = wf_c.make_params()
    g_c = wf_c.pgradient(pc, configs.positions)
    g_e = wf_e.pgradient(pe, configs.positions)
    for tag, cname in (("alpha", "mo_coeff_alpha"), ("beta", "mo_coeff_beta")):
        for k in range(len(g_c[cname])):
            d = np.asarray(g_c[cname][k])
            np.testing.assert_allclose(
                np.asarray(g_e[f"mo_coeff_{tag}_re"][k]), np.real(d),
                rtol=1e-7, atol=1e-9,
            )
            np.testing.assert_allclose(
                np.asarray(g_e[f"mo_coeff_{tag}_im"][k]), -np.imag(d),
                rtol=1e-7, atol=1e-9,
            )


def test_embedded_ecp_matches_complex(general_twist_setup):
    """Nonlocal ECP projection needs the RATIO'S PHASE, not its modulus:
    the embedded path must reproduce the complex path's per-walker ECP
    local energy (real and imaginary channels) through testvalue_pair."""
    from pyqmc_tpu.observables.ecp import ECPAccumulator

    sup, wf_c, wf_e = general_twist_setup
    pc, pe = wf_c.make_params(), wf_e.make_params()
    configs = initial_guess(sup, 6, key=jax.random.PRNGKey(21))
    pos = configs.positions
    st_c = wf_c.recompute(pc, pos)
    st_e = wf_e.recompute(pe, pos)
    acc = ECPAccumulator(sup, naip=6)
    key = jax.random.PRNGKey(22)
    ec, ec_im = acc(wf_c, pc, st_c, pos, key, with_imag=True)
    ee, ee_im = acc(wf_e, pe, st_e, pos, key, with_imag=True)
    np.testing.assert_allclose(np.asarray(ee), np.asarray(ec),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ee_im), np.asarray(ec_im),
                               rtol=1e-6, atol=1e-9)
    # the imaginary channel is genuinely nonzero at a general twist
    assert np.max(np.abs(np.asarray(ec_im))) > 1e-8


def test_embedded_imag_channels(general_twist_setup):
    """Phase-channel parity with the complex path (see the pair-path test
    of the same name): Im grad/lap, E_I, and the phase pgradient tree."""
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator

    sup, wf_c, wf_e = general_twist_setup
    pc, pe = wf_c.make_params(), wf_e.make_params()
    configs = initial_guess(sup, 4, key=jax.random.PRNGKey(51))
    pos = configs.positions
    st_c = wf_c.recompute(pc, pos)
    st_e = wf_e.recompute(pe, pos)
    for e in (0, 11):
        epos = pos[:, e, :]
        g_c, l_c = wf_c.gradient_laplacian(pc, st_c, jnp.int32(e), epos)
        gr, gi, lr, li = wf_e.gradient_laplacian_pair(
            pe, st_e, jnp.int32(e), epos
        )
        np.testing.assert_allclose(np.asarray(gi), np.imag(np.asarray(g_c)),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(li), np.imag(np.asarray(l_c)),
                                   rtol=1e-6, atol=1e-9)
    acc = EnergyAccumulator(sup)
    key = jax.random.PRNGKey(52)
    d_c = acc(wf_c, pc, st_c, pos, key=key, with_imag=True)
    d_e = acc(wf_e, pe, st_e, pos, key=key, with_imag=True)
    np.testing.assert_allclose(np.asarray(d_e["total"]),
                               np.asarray(d_c["total"]), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(d_e["total_im"]),
                               np.asarray(d_c["total_im"]),
                               rtol=1e-6, atol=1e-9)
    # phase pgradient vs holomorphic complex derivatives
    g_c = wf_c.pgradient(pc, pos)
    _, g_im = wf_e.pgradient_pair(pe, pos)
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
