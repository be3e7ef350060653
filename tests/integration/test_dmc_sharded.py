"""Sharded DMC: global comb branching + periodic T-moves.

Parity targets: the reference's DMC gathers the full population to one
comb (dmc.py:238-304) — the mesh version here must match single-device
physics and rebalance walkers across shards; periodic ECP T-moves must
keep walkers folded in the cell (eval_ecp/make_irreducible semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ..fixtures_pbc import load_cell
from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.method.dmc import rundmc
from pyqmc_tpu.configs import initial_guess
from pyqmc_tpu.reblock import reblock_summary


def _h2_dmc(mesh, nconf, key, nblocks=60):
    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    configs = initial_guess(mol, nconf, key=jax.random.PRNGKey(0))
    data, _, weights = rundmc(
        wf, wf.make_params(), configs, nblocks=nblocks, nsteps_per_block=10,
        tstep=0.04, energy_acc=EnergyAccumulator(mol), key=key, mesh=mesh,
        warmup_vmc_blocks=3,
    )
    en = np.array([d["energytotal"] for d in data])[nblocks // 3:]
    rb = reblock_summary(en, nblocks=12)
    return float(rb["mean"]), float(rb["standard error"]), weights, data


@pytest.mark.slow
def test_dmc_sharded_matches_single():
    """1-device vs 8-device DMC on H2 agree within SEM; the global comb
    keeps every shard's weights healthy."""
    mesh = jax.make_mesh((len(jax.devices()),), ("walkers",))
    m1, s1, w1, _ = _h2_dmc(None, 512, jax.random.PRNGKey(11))
    m8, s8, w8, d8 = _h2_dmc(mesh, 512, jax.random.PRNGKey(12))
    sem = np.sqrt(s1**2 + s8**2)
    assert abs(m1 - m8) < 5 * max(sem, 1e-4), (m1, m8, sem)
    # post-branch weights are globally uniform (proof the comb is global:
    # a local comb leaves per-shard mean weights unequal)
    w8 = np.asarray(w8)
    assert np.allclose(w8, w8[0], rtol=1e-5)
    # block weights stayed controlled
    wavg = np.array([d["weight"] for d in d8])
    assert np.all(wavg > 0.5) and np.all(wavg < 2.0)


@pytest.mark.slow
def test_dmc_tmoves_periodic_li():
    """Periodic ccECP T-move DMC: walkers remain folded inside the cell
    (T-move targets pass through geometry.enforce) and the energy is sane."""
    cell, d = load_cell("li_cubic_ccecp")
    mf_like = type("MF", (), {})()
    # build a gamma-point Slater from the fixture's k=0 orbitals
    mo = np.asarray(d["mo_coeff"][0])
    occ = np.asarray(d["mo_occ"][0])
    nup, ndn = cell.nelec
    cols = np.nonzero(occ > 0.5)[0]
    from pyqmc_tpu.models.orbitals import KPointOrbitals
    from pyqmc_tpu.models.slater import DeterminantExpansion

    orb = KPointOrbitals(
        cell, kpts=np.zeros((1, 3)),
        mo_coeff=([mo[:, cols[:nup]]], [mo[:, cols[:ndn]]]),
    )
    wf = Slater(cell, orb, DeterminantExpansion.single(nup, ndn))
    configs = initial_guess(cell, 200, key=jax.random.PRNGKey(3))
    acc = EnergyAccumulator(cell)
    assert acc.ecp_acc is not None and acc.ecp_acc.active
    data, final, weights = rundmc(
        wf, wf.make_params(), configs, nblocks=12, nsteps_per_block=8,
        tstep=0.04, energy_acc=acc, key=jax.random.PRNGKey(4),
        warmup_vmc_blocks=2,
    )
    en = np.array([d_["energytotal"] for d_ in data])
    assert np.all(np.isfinite(en))
    # every position is inside the home cell: enforce() is a no-op
    folded, wrapdelta = final.geometry.enforce(
        final.positions.reshape(-1, 3)
    )
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(final.positions.reshape(-1, 3)),
        atol=1e-9,
    )
    assert np.all(np.asarray(wrapdelta) == 0)
