"""Fused Pallas Metropolis sweep vs the XLA sweep (interpret mode on CPU).

The fused kernel (ops/move_pallas.py) consumes the same pre-drawn gauss/
unif arrays as method/vmc.py's sweep, so the two paths must produce the
same Markov chain to fp rounding — positions, acceptance, and every
SlaterState/JastrowState leaf.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
from pyqmc_tpu.models.jastrow import JastrowSpin
from pyqmc_tpu.models.multiply import (
    MultiplyWF, default_move_begin, default_move_finish,
)
from pyqmc_tpu.configs import Geometry
from pyqmc_tpu.ops.move_pallas import build_fused_sweep
from pyqmc_tpu.method.vmc import make_vmc_block, limdrift


def _h2o_sj(rng, jastrow=True):
    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
        basis="sto-3g",
    )
    nup, ndn = mol.nelec
    ca = rng.normal(size=(mol.nao, nup))
    cb = rng.normal(size=(mol.nao, ndn))
    slater = Slater(mol, None, DeterminantExpansion.single(nup, ndn), (ca, cb))
    if not jastrow:
        return mol, slater, slater.make_params()
    jas = JastrowSpin(mol)
    wf = MultiplyWF(slater, jas)
    params = wf.make_params()
    params["wf1"]["acoeff"] = jnp.asarray(
        rng.normal(scale=0.1, size=params["wf1"]["acoeff"].shape)
    )
    params["wf1"]["bcoeff"] = params["wf1"]["bcoeff"] + jnp.asarray(
        rng.normal(scale=0.05, size=params["wf1"]["bcoeff"].shape)
    )
    return mol, wf, params


def _reference_sweep(wf, params, positions, state, gauss, unif, tstep=0.5):
    """Literal copy of method/vmc.py's ebody semantics (open boundary)."""
    nelec = wf.nelec
    acc_tot = 0.0
    for e_ in range(nelec):
        e = jnp.int32(e_)  # the wf protocol takes a traced electron index
        epos = positions[:, e_, :]
        grad_old, aux = default_move_begin(wf, params, state, e, epos)
        drift_old = limdrift(grad_old)
        newpos = epos + gauss[e_] + tstep * drift_old
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
        acc_tot += float(jnp.mean(accept))
    return positions, state, acc_tot


@pytest.mark.parametrize("jastrow", [True, False])
def test_fused_sweep_matches_reference(rng, jastrow):
    out = _h2o_sj(rng, jastrow=jastrow)
    mol, wf, params = out
    nconf, nelec = 10, wf.nelec
    positions = jnp.asarray(rng.normal(scale=1.5, size=(nconf, nelec, 3)))
    geometry = Geometry(None)
    state = wf.recompute(params, positions)
    gauss = jnp.asarray(
        rng.normal(size=(nelec, nconf, 3)) * np.sqrt(0.5)
    )
    unif = jnp.asarray(rng.uniform(size=(nelec, nconf)))
    fused = build_fused_sweep(wf, geometry, tstep=0.5, interpret=True)
    assert fused is not None
    wrap = jnp.zeros((nconf, nelec, 3), jnp.int32)
    p_f, _, st_f, acc_f = fused(params, positions, wrap, state, gauss, unif)
    p_r, st_r, acc_r = _reference_sweep(wf, params, positions, state,
                                        gauss, unif)
    np.testing.assert_allclose(p_f, p_r, atol=1e-10)
    np.testing.assert_allclose(float(acc_f), acc_r, atol=1e-12)
    for lf, lr in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_r)):
        np.testing.assert_allclose(lf, lr, atol=1e-9)


def test_fused_block_matches_xla_block(rng):
    """Whole 2-step block through make_vmc_block: fused vs XLA sweep with
    the same RNG key — chain equality across steps transitively checks the
    in-kernel Sherman-Morrison/caches feeding the next sweep."""
    mol, wf, params = _h2o_sj(rng)
    nconf = 6
    positions = jnp.asarray(rng.normal(scale=1.5, size=(nconf, wf.nelec, 3)))
    wrap = jnp.zeros((nconf, wf.nelec, 3), jnp.int32)
    geometry = Geometry(None)
    key = jax.random.PRNGKey(11)
    b_ref = make_vmc_block(wf, {}, geometry, tstep=0.5, nsteps=2, fused=False)
    b_fus = make_vmc_block(wf, {}, geometry, tstep=0.5, nsteps=2,
                           fused="interpret")
    p1, w1, a1 = b_ref(params, jnp.array(positions), jnp.array(wrap), key)
    p2, w2, a2 = b_fus(params, jnp.array(positions), jnp.array(wrap), key)
    np.testing.assert_allclose(p1, p2, atol=1e-9)
    np.testing.assert_allclose(
        float(a1["acceptance"]), float(a2["acceptance"]), atol=1e-12
    )


def test_fused_dmc_sweep_matches_reference(rng):
    """mode='dmc': Umrigar drift, fixed-node rejection, r2 stats — vs a
    literal copy of method/dmc.py's drift-diffusion sweep semantics."""
    from pyqmc_tpu.method.dmc import limdrift_umrigar

    mol, wf, params = _h2o_sj(rng)
    nconf, nelec = 10, wf.nelec
    tstep = 0.02
    positions = jnp.asarray(rng.normal(scale=1.5, size=(nconf, nelec, 3)))
    geometry = Geometry(None)
    state = wf.recompute(params, positions)
    gauss = jnp.asarray(rng.normal(size=(nelec, nconf, 3)) * np.sqrt(tstep))
    unif = jnp.asarray(rng.uniform(size=(nelec, nconf)))
    fused = build_fused_sweep(wf, geometry, tstep=tstep, interpret=True,
                              mode="dmc")
    assert fused is not None
    wrap = jnp.zeros((nconf, nelec, 3), jnp.int32)
    p_f, _, st_f, (acc_f, r2p_f, r2a_f) = fused(
        params, positions, wrap, state, gauss, unif
    )

    # reference (method/dmc.py sweep semantics, open boundary)
    pos_r, st_r = positions, state
    acc_tot = 0.0
    r2p = jnp.zeros(nconf)
    r2a = jnp.zeros(nconf)
    for e_ in range(nelec):
        e = jnp.int32(e_)
        epos = pos_r[:, e_, :]
        grad_old, aux = default_move_begin(wf, params, st_r, e, epos)
        drift_old = limdrift_umrigar(grad_old, tstep)
        newpos = epos + gauss[e_] + tstep * drift_old
        grad_new, ratio, saved = default_move_finish(
            wf, params, st_r, e, newpos, aux
        )
        drift_new = limdrift_umrigar(grad_new, tstep)
        forward = jnp.sum(gauss[e_] ** 2, axis=-1)
        backward = jnp.sum(
            (gauss[e_] + tstep * (drift_old + drift_new)) ** 2, axis=-1
        )
        t_prob = jnp.exp((forward - backward) / (2.0 * tstep))
        ap = jnp.abs(ratio) ** 2 * t_prob
        ap = jnp.where(jnp.real(ratio) <= 0, 0.0, ap)
        accept = ap > unif[e_]
        st_r = wf.updateinternals(params, st_r, e, newpos, accept, saved)
        pos_r = pos_r.at[:, e_, :].set(jnp.where(accept[:, None], newpos, epos))
        r2 = jnp.sum((gauss[e_] + tstep * drift_old) ** 2, axis=-1)
        r2p = r2p + r2
        r2a = r2a + jnp.where(accept, r2, 0.0)
        acc_tot += float(jnp.mean(accept))

    np.testing.assert_allclose(p_f, pos_r, atol=1e-10)
    np.testing.assert_allclose(float(acc_f), acc_tot, atol=1e-12)
    np.testing.assert_allclose(r2p_f, r2p, atol=1e-10)
    np.testing.assert_allclose(r2a_f, r2a, atol=1e-10)
    for lf, lr in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_r)):
        np.testing.assert_allclose(lf, lr, atol=1e-9)


def test_fused_tmove_block_matches_xla(rng):
    """Whole 1-step DMC block (T-move sweep + drift sweep + energy) through
    make_dmc_block: fused Pallas path vs XLA path with the same key — the
    fused T-move consumes pre-drawn rotations from the same tqkeys, so the
    chains must agree to fp rounding."""
    from pyqmc_tpu.method.dmc import make_dmc_block
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator

    mol = Molecule("C 0 0 0", basis="ccecpccpvdz", ecp="ccecp", spin=2)
    nup, ndn = mol.nelec
    ca = rng.normal(size=(mol.nao, nup))
    cb = rng.normal(size=(mol.nao, ndn))
    slater = Slater(mol, None, DeterminantExpansion.single(nup, ndn), (ca, cb))
    jas = JastrowSpin(mol)
    wf = MultiplyWF(slater, jas)
    params = wf.make_params()
    params["wf1"]["acoeff"] = jnp.asarray(
        rng.normal(scale=0.1, size=params["wf1"]["acoeff"].shape)
    )
    acc = EnergyAccumulator(mol)
    assert acc.ecp_acc is not None and acc.ecp_acc.active
    nconf = 6
    positions = jnp.asarray(rng.normal(scale=1.5, size=(nconf, wf.nelec, 3)))
    wrap = jnp.zeros((nconf, wf.nelec, 3), jnp.int32)
    geometry = Geometry(None)
    key = jax.random.PRNGKey(21)
    tstep = 0.05
    outs = {}
    for fused in (False, "interpret"):
        blk, _ = make_dmc_block(wf, acc, geometry, tstep, 1, fused=fused)
        w0 = jnp.ones(nconf, positions.dtype)
        p, w, wts, avg = blk(
            params, jnp.array(positions), jnp.array(wrap), w0, key,
            jnp.float64(-5.3), jnp.float64(-5.3), jnp.float64(1.0),
        )
        outs[bool(fused)] = (p, wts, avg)
    np.testing.assert_allclose(outs[False][0], outs[True][0], atol=1e-9)
    np.testing.assert_allclose(outs[False][1], outs[True][1], rtol=1e-9)
    np.testing.assert_allclose(
        float(outs[False][2]["energytotal"]),
        float(outs[True][2]["energytotal"]), rtol=1e-9,
    )


def _bc_sj(rng):
    """Heterogeneous-naip ECP system: B (tpu1, 2 nonlocal channels, naip 12)
    + C (ccECP, 1 channel, naip 6) — the quadrature group order (sorted by
    naip: C first) differs from nl_atoms order (B first), regression for
    the round-4 advisor category-order finding."""
    from pyqmc_tpu.system.basis import get_basis, get_ecp

    bas = {**get_basis("tpu1dz", ["B"]), **get_basis("ccecpccpvdz", ["C"])}
    ecp = {**get_ecp("tpu1", ["B"]), **get_ecp("ccecp", ["C"])}
    mol = Molecule([("B", (0, 0, 0)), ("C", (0, 0, 2.8))], basis=bas,
                   ecp=ecp, spin=1)
    nup, ndn = mol.nelec
    ca = rng.normal(size=(mol.nao, nup))
    cb = rng.normal(size=(mol.nao, ndn))
    slater = Slater(mol, None, DeterminantExpansion.single(nup, ndn), (ca, cb))
    jas = JastrowSpin(mol)
    wf = MultiplyWF(slater, jas)
    params = wf.make_params()
    params["wf1"]["acoeff"] = jnp.asarray(
        rng.normal(scale=0.1, size=params["wf1"]["acoeff"].shape)
    )
    return mol, wf, params


def test_fused_ecp_energy_matches_xla(rng):
    """Fused Pallas nonlocal-ECP energy vs the XLA dense quadrature chain:
    same key => same rotations => identical energies to fp rounding.
    Heterogeneous per-atom naip exercises the sorted-group emission order."""
    from pyqmc_tpu.observables.ecp import ECPAccumulator

    mol, wf, params = _bc_sj(rng)
    nconf = 6
    positions = jnp.asarray(rng.normal(scale=1.5, size=(nconf, wf.nelec, 3)))
    state = wf.recompute(params, positions)
    key = jax.random.PRNGKey(7)
    acc_x = ECPAccumulator(mol, fused=False)
    acc_f = ECPAccumulator(mol, fused="interpret")
    assert acc_x.nselect is None  # dense: the fused path's precondition
    e_x = np.asarray(acc_x(wf, params, state, positions, key))
    assert acc_f._get_fused(wf) is not None
    e_f = np.asarray(acc_f(wf, params, state, positions, key))
    np.testing.assert_allclose(e_f, e_x, rtol=1e-9, atol=1e-11)
    assert np.max(np.abs(e_x)) > 1e-4  # nontrivial energies


@pytest.mark.slow
def test_fused_tmove_heterogeneous_naip(rng):
    """Whole 1-step DMC block on the B/C heterogeneous-naip system: the
    fused T-move kernel must emit quadrature categories in the same
    sorted-naip group order as the XLA _quadrature_geometry so the shared
    u_sel stream selects identical moves (round-4 advisor finding)."""
    from pyqmc_tpu.method.dmc import make_dmc_block
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.observables.ecp import ECPAccumulator

    mol, wf, params = _bc_sj(rng)
    acc = EnergyAccumulator(mol, ecp_acc=ECPAccumulator(mol, fused=False))
    assert acc.ecp_acc.active and len(set(acc.ecp_acc.atom_naip)) == 2
    nconf = 4
    positions = jnp.asarray(rng.normal(scale=1.5, size=(nconf, wf.nelec, 3)))
    wrap = jnp.zeros((nconf, wf.nelec, 3), jnp.int32)
    geometry = Geometry(None)
    key = jax.random.PRNGKey(23)
    outs = {}
    for fused in (False, "interpret"):
        blk, _ = make_dmc_block(wf, acc, geometry, 0.05, 1, fused=fused)
        w0 = jnp.ones(nconf, positions.dtype)
        p, w, wts, avg = blk(
            params, jnp.array(positions), jnp.array(wrap), w0, key,
            jnp.float64(-8.0), jnp.float64(-8.0), jnp.float64(1.0),
        )
        outs[bool(fused)] = (p, wts, avg)
    np.testing.assert_allclose(outs[False][0], outs[True][0], atol=1e-9)
    np.testing.assert_allclose(outs[False][1], outs[True][1], rtol=1e-9)


def test_gating():
    """Unsupported patterns return None (caller falls back to XLA sweep)."""
    mol = Molecule("He 0 0 0", basis="sto-3g")
    nup, ndn = mol.nelec
    # periodic geometry -> unsupported
    slater = Slater(mol, None, DeterminantExpansion.single(nup, ndn),
                    (np.eye(mol.nao)[:, :nup], np.eye(mol.nao)[:, :ndn]))
    assert build_fused_sweep(slater, Geometry(np.eye(3) * 10), 0.5) is None
    # spin-polarized empty channel -> unsupported
    molh = Molecule("H 0 0 0", basis="sto-3g", spin=1)
    sh = Slater(molh, None, DeterminantExpansion.single(1, 0),
                (np.eye(molh.nao)[:, :1], np.eye(molh.nao)[:, :0]))
    assert build_fused_sweep(sh, Geometry(None), 0.5) is None
