"""Overlap sampling + ensemble (excited-state) optimization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.observables.transform import LinearTransform
from pyqmc_tpu.method.sample_many import sample_overlap
from pyqmc_tpu.method.ensemble import optimize_ensemble
from pyqmc_tpu.configs import initial_guess


@pytest.fixture(scope="module")
def h2_states():
    mf = run_scf(Molecule("H 0 0 0; H 0 0 1.4", basis="ccpvdz"))
    mol = mf.mol
    gs = Slater.from_mean_field(mf)
    # "excited": sigma -> sigma* on the up electron
    ca = mf.mo_coeff[0][:, :2]
    ex = Slater(
        mol, None,
        DeterminantExpansion(
            occ_up=np.array([[1]]), occ_dn=np.array([[0]]),
            map_up=np.zeros(1, dtype=np.int64), map_dn=np.zeros(1, dtype=np.int64),
        ),
        (ca, ca),
    )
    return mf, gs, ex


def test_sample_overlap(h2_states):
    mf, gs, ex = h2_states
    mol = mf.mol
    configs = initial_guess(mol, 800, key=jax.random.PRNGKey(0))
    acc = EnergyAccumulator(mol)
    data, configs = sample_overlap(
        (gs, ex), (gs.make_params(), ex.make_params()), configs,
        jax.random.PRNGKey(1), nblocks=12, nsteps=10, energy_acc=acc,
    )
    N = np.mean([d["overlap"] for d in data[4:]], axis=0)
    # exact orthogonality of different determinants of the same orbital set
    o01 = N[0, 1] / np.sqrt(N[0, 0] * N[1, 1])
    assert abs(o01) < 0.1, N
    # energies: excited above ground
    e0 = np.mean([d["energy0_num"] / d["energy0_den"] for d in data[4:]])
    e1 = np.mean([d["energy1_num"] / d["energy1_den"] for d in data[4:]])
    assert e1 > e0 + 0.1, (e0, e1)
    assert abs(e0 - mf.e_tot) < 0.05, (e0, mf.e_tot)


def test_optimize_ensemble_runs(h2_states):
    """Penalty optimization: excited det_coeff mixes stay orthogonal."""
    mf, gs, ex = h2_states
    mol = mf.mol
    # state 1: superposition with optimizable det_coeff that *could* collapse
    # into the ground state without the penalty
    ca = mf.mo_coeff[0][:, :2]
    mixed = Slater(
        mol, None,
        DeterminantExpansion(
            occ_up=np.array([[0], [1]]), occ_dn=np.array([[0]]),
            map_up=np.array([0, 1]), map_dn=np.array([0, 0]),
        ),
        (ca, ca), det_coeff=np.array([0.5, 0.8]),
    )
    p0 = gs.make_params()
    p1 = mixed.make_params()
    t1 = LinearTransform(
        p1, {"det_coeff": True, "mo_coeff_alpha": False, "mo_coeff_beta": False}
    )
    configs = initial_guess(mol, 600, key=jax.random.PRNGKey(2))
    acc = EnergyAccumulator(mol)
    params_list, records = optimize_ensemble(
        (gs, mixed), (p0, p1), (None, t1), configs, acc,
        key=jax.random.PRNGKey(3), max_iterations=6, penalty=4.0, tau=0.3,
        nblocks=4, nsteps=10,
    )
    # the ground-state component of state 1 must have shrunk
    c = np.asarray(params_list[1]["det_coeff"])
    frac0 = abs(c[0]) / np.linalg.norm(c)
    assert frac0 < 0.5 / np.linalg.norm([0.5, 0.8]) + 0.05, c
    assert np.isfinite(records[-1]["energy1"])


def test_sample_overlap_adapted_accumulator(h2_states):
    """Arbitrary single-wf accumulators evaluated under the mixed
    distribution with per-state importance weights (the reference's
    AdaptSingleAccumulator, accumulators_multiwf.py:57-92): <S^2> of each
    H2 state from the overlap sample matches its exact value."""
    from pyqmc_tpu.observables.s2 import S2Accumulator

    mf, gs, ex = h2_states
    mol = mf.mol
    configs = initial_guess(mol, 600, key=jax.random.PRNGKey(20))
    data, _ = sample_overlap(
        (gs, ex), (gs.make_params(), ex.make_params()), configs,
        jax.random.PRNGKey(21), nblocks=10, nsteps=10,
        accumulators={"s2": S2Accumulator(mol)},
    )
    # RHF singlet: <S^2> = 0; the sigma->sigma* open-shell determinant is
    # an equal singlet/triplet mix: <S^2> = 1
    s0 = np.mean([d["s20_S2_num"] / d["state0_den"] for d in data[3:]])
    s1 = np.mean([d["s21_S2_num"] / d["state1_den"] for d in data[3:]])
    assert abs(s0 - 0.0) < 0.1, s0
    assert abs(s1 - 1.0) < 0.15, s1
