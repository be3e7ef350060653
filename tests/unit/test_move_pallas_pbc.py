"""Fused periodic Pallas Metropolis sweep vs the XLA sweep (interpret mode).

The periodic kernel (ops/move_pallas_pbc.py) consumes the same pre-drawn
gauss/unif arrays as method/vmc.py's sweep; positions, wrap counters,
acceptance, and every SlaterState/JastrowState leaf must agree. Workload:
gamma-point diamond primitive cell (2 C atoms, 8 valence electrons, real
mode) — the small instance of the diamond-supercell benchmark pattern.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ..fixtures_pbc import load_cell
from pyqmc_tpu.system.supercell import get_supercell
from pyqmc_tpu.models.orbitals import KPointOrbitals
from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
from pyqmc_tpu.models.jastrow import JastrowSpin
from pyqmc_tpu.models.multiply import (
    MultiplyWF, default_move_begin, default_move_finish,
)
from pyqmc_tpu.ops.move_pallas import build_fused_sweep
from pyqmc_tpu.ops.move_pallas_pbc import build_fused_sweep_pbc
from pyqmc_tpu.method.vmc import make_vmc_block, limdrift
from pyqmc_tpu.configs import initial_guess
from pyqmc_tpu.wftools import default_jastrow_basis


def _gamma_sj(rng, jastrow=True, nkgrid=1):
    """Gamma-point (or TRIM-mesh) diamond Slater-Jastrow on the supercell."""
    cell, d = load_cell("diamond_primitive")
    sup = get_supercell(cell, nkgrid * np.eye(3, dtype=int))
    kpts_all = np.asarray(d["kpts"])
    if nkgrid == 1:
        kidx = [int(np.argmin(np.linalg.norm(kpts_all, axis=1)))]
    else:
        kidx = list(range(len(kpts_all)))
    kpts = kpts_all[kidx]
    nocc = 4
    blocks = [np.asarray(d["mo_coeff"][k])[:, :nocc] for k in kidx]
    norb = nocc * len(kidx)
    orb = KPointOrbitals(cell, kpts, (blocks, blocks), img_tol=1e-4)
    assert orb.real_mode
    slater = Slater(sup, orb, DeterminantExpansion.single(norb, norb))
    if not jastrow:
        return sup, slater, slater.make_params()
    a_b, b_b = default_jastrow_basis(sup)
    jas = JastrowSpin(sup, a_basis=a_b, b_basis=b_b)
    wf = MultiplyWF(slater, jas)
    params = wf.make_params()
    params["wf1"]["acoeff"] = jnp.asarray(
        rng.normal(scale=0.1, size=params["wf1"]["acoeff"].shape)
    )
    params["wf1"]["bcoeff"] = params["wf1"]["bcoeff"] + jnp.asarray(
        rng.normal(scale=0.05, size=params["wf1"]["bcoeff"].shape)
    )
    return sup, wf, params


def _reference_sweep(wf, params, positions, wrap, state, gauss, unif,
                     geometry, tstep=0.5):
    """Literal copy of method/vmc.py's ebody semantics (periodic)."""
    nelec = wf.nelec
    acc_tot = 0.0
    for e_ in range(nelec):
        e = jnp.int32(e_)
        epos = positions[:, e_, :]
        grad_old, aux = default_move_begin(wf, params, state, e, epos)
        drift_old = limdrift(grad_old)
        prop = epos + gauss[e_] + tstep * drift_old
        newpos, wrapdelta = geometry.enforce(prop)
        grad_new, ratio, saved = default_move_finish(
            wf, params, state, e, newpos, aux
        )
        drift_new = limdrift(grad_new)
        forward = jnp.sum(gauss[e_] ** 2, axis=-1)
        backward = jnp.sum(
            (gauss[e_] + tstep * (drift_old + drift_new)) ** 2, axis=-1
        )
        t_prob = jnp.exp((forward - backward) / (2.0 * tstep))
        accept = jnp.abs(ratio) ** 2 * t_prob > unif[e_]
        state = wf.updateinternals(params, state, e, newpos, accept, saved)
        positions = positions.at[:, e_, :].set(
            jnp.where(accept[:, None], newpos, epos)
        )
        wrap = wrap.at[:, e_, :].set(
            jnp.where(accept[:, None], wrap[:, e_, :] + wrapdelta,
                      wrap[:, e_, :])
        )
        acc_tot += float(jnp.mean(accept))
    return positions, wrap, state, acc_tot


@pytest.mark.parametrize("jastrow", [True, False])
def test_fused_pbc_sweep_matches_reference(rng, jastrow):
    sup, wf, params = _gamma_sj(rng, jastrow=jastrow)
    nconf, nelec = 6, wf.nelec
    configs = initial_guess(sup, nconf, key=jax.random.PRNGKey(0))
    geometry = configs.geometry
    positions = configs.positions
    wrap = jnp.zeros((nconf, nelec, 3), jnp.int32)
    state = wf.recompute(params, positions)
    tstep = 0.5
    gauss = jnp.asarray(rng.normal(size=(nelec, nconf, 3)) * np.sqrt(tstep))
    unif = jnp.asarray(rng.uniform(size=(nelec, nconf)))
    # the generic builder must delegate to the periodic kernel
    fused = build_fused_sweep(wf, geometry, tstep=tstep, interpret=True)
    assert fused is not None
    p_f, w_f, st_f, acc_f = fused(params, positions, wrap, state, gauss, unif)
    p_r, w_r, st_r, acc_r = _reference_sweep(
        wf, params, positions, wrap, state, gauss, unif, geometry,
        tstep=tstep,
    )
    np.testing.assert_allclose(p_f, p_r, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(w_f), np.asarray(w_r))
    np.testing.assert_allclose(float(acc_f), acc_r, atol=1e-12)
    for lf, lr in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_r)):
        np.testing.assert_allclose(lf, lr, atol=1e-8)


def test_fused_pbc_block_matches_xla_block(rng):
    """Whole 2-step block through make_vmc_block: fused vs XLA sweep with
    the same RNG key — chain equality across steps transitively checks the
    in-kernel Sherman-Morrison/caches/wrap feeding the next sweep."""
    sup, wf, params = _gamma_sj(rng)
    nconf = 4
    configs = initial_guess(sup, nconf, key=jax.random.PRNGKey(5))
    geometry = configs.geometry
    positions = configs.positions
    wrap = jnp.zeros((nconf, wf.nelec, 3), jnp.int32)
    key = jax.random.PRNGKey(11)
    b_ref = make_vmc_block(wf, {}, geometry, tstep=0.5, nsteps=2, fused=False)
    b_fus = make_vmc_block(wf, {}, geometry, tstep=0.5, nsteps=2,
                           fused="interpret")
    p1, w1, a1 = b_ref(params, jnp.array(positions), jnp.array(wrap), key)
    p2, w2, a2 = b_fus(params, jnp.array(positions), jnp.array(wrap), key)
    np.testing.assert_allclose(p1, p2, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_allclose(
        float(a1["acceptance"]), float(a2["acceptance"]), atol=1e-12
    )


def test_fused_pbc_sweep_multitile(rng):
    """grid > 1 (nconf spanning several walker tiles): every tile must see
    its own walker state. Regression for the round-5 collapse bug where
    state was read through aliased OUTPUT refs — valid only for grid=1, so
    tiles past the first got unpopulated buffers and walkers collapsed to
    the origin on TPU (CPU f32 benchmark symptom: E/cell = NaN)."""
    sup, wf, params = _gamma_sj(rng)
    nconf, nelec = 10, wf.nelec
    configs = initial_guess(sup, nconf, key=jax.random.PRNGKey(9))
    geometry = configs.geometry
    positions = configs.positions
    wrap = jnp.zeros((nconf, nelec, 3), jnp.int32)
    state = wf.recompute(params, positions)
    tstep = 0.5
    gauss = jnp.asarray(rng.normal(size=(nelec, nconf, 3)) * np.sqrt(tstep))
    unif = jnp.asarray(rng.uniform(size=(nelec, nconf)))
    fused = build_fused_sweep_pbc(wf, geometry, tstep=tstep, interpret=True,
                                  tile=4)  # 10 walkers -> grid=3, padded
    assert fused is not None
    p_f, w_f, st_f, acc_f = fused(params, positions, wrap, state, gauss, unif)
    p_r, w_r, st_r, acc_r = _reference_sweep(
        wf, params, positions, wrap, state, gauss, unif, geometry,
        tstep=tstep,
    )
    np.testing.assert_allclose(p_f, p_r, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(w_f), np.asarray(w_r))
    for lf, lr in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_r)):
        np.testing.assert_allclose(lf, lr, atol=1e-8)


def test_fused_pbc_dmc_sweep_matches_reference(rng):
    """mode='dmc': Umrigar drift, fixed-node rejection, r2 stats, periodic
    folds — vs a literal copy of method/dmc.py's drift-diffusion sweep."""
    from pyqmc_tpu.method.dmc import limdrift_umrigar

    sup, wf, params = _gamma_sj(rng)
    nconf, nelec = 6, wf.nelec
    tstep = 0.02
    configs = initial_guess(sup, nconf, key=jax.random.PRNGKey(2))
    geometry = configs.geometry
    positions = configs.positions
    wrap = jnp.zeros((nconf, nelec, 3), jnp.int32)
    state = wf.recompute(params, positions)
    gauss = jnp.asarray(rng.normal(size=(nelec, nconf, 3)) * np.sqrt(tstep))
    unif = jnp.asarray(rng.uniform(size=(nelec, nconf)))
    fused = build_fused_sweep_pbc(wf, geometry, tstep=tstep, interpret=True,
                                  mode="dmc")
    assert fused is not None
    p_f, w_f, st_f, (acc_f, r2p_f, r2a_f) = fused(
        params, positions, wrap, state, gauss, unif
    )

    pos_r, wrap_r, st_r = positions, wrap, state
    acc_tot = 0.0
    r2p = jnp.zeros(nconf)
    r2a = jnp.zeros(nconf)
    for e_ in range(nelec):
        e = jnp.int32(e_)
        epos = pos_r[:, e_, :]
        grad_old, aux = default_move_begin(wf, params, st_r, e, epos)
        drift_old = limdrift_umrigar(grad_old, tstep)
        prop = epos + gauss[e_] + tstep * drift_old
        newpos, wrapdelta = geometry.enforce(prop)
        grad_new, ratio, saved = default_move_finish(
            wf, params, st_r, e, newpos, aux
        )
        drift_new = limdrift_umrigar(grad_new, tstep)
        forward = jnp.sum(gauss[e_] ** 2, axis=-1)
        backward = jnp.sum(
            (gauss[e_] + tstep * (drift_old + drift_new)) ** 2, axis=-1
        )
        t_prob = jnp.exp((forward - backward) / (2.0 * tstep))
        accept_prob = jnp.abs(ratio) ** 2 * t_prob
        accept_prob = jnp.where(ratio <= 0, 0.0, accept_prob)
        accept = accept_prob > unif[e_]
        prop_d = gauss[e_] + tstep * drift_old
        r2 = jnp.sum(prop_d * prop_d, axis=-1)
        r2p = r2p + r2
        r2a = r2a + jnp.where(accept, r2, 0.0)
        st_r = wf.updateinternals(params, st_r, e, newpos, accept, saved)
        pos_r = pos_r.at[:, e_, :].set(
            jnp.where(accept[:, None], newpos, epos)
        )
        wrap_r = wrap_r.at[:, e_, :].set(
            jnp.where(accept[:, None], wrap_r[:, e_, :] + wrapdelta,
                      wrap_r[:, e_, :])
        )
        acc_tot += float(jnp.mean(accept))
    np.testing.assert_allclose(p_f, pos_r, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(w_f), np.asarray(wrap_r))
    np.testing.assert_allclose(float(acc_f), acc_tot, atol=1e-12)
    np.testing.assert_allclose(r2p_f, r2p, atol=1e-9)
    np.testing.assert_allclose(r2a_f, r2a, atol=1e-9)
    for lf, lr in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_r)):
        np.testing.assert_allclose(lf, lr, atol=1e-8)
