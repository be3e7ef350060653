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


def test_sample_overlap_sharded(h2_states):
    """Overlap sampling over an 8-device mesh: the shard_map'd block gives
    the same overlap matrix and per-state energies as the single-device run
    (within Monte-Carlo error; the streams differ by the per-shard fold)."""
    from pyqmc_tpu.parallel.mesh import walker_mesh

    mf, gs, ex = h2_states
    mol = mf.mol
    acc = EnergyAccumulator(mol)
    mesh = walker_mesh(8)
    results = {}
    for tag, m in (("single", None), ("sharded", mesh)):
        configs = initial_guess(mol, 800, key=jax.random.PRNGKey(5))
        data, out_configs = sample_overlap(
            (gs, ex), (gs.make_params(), ex.make_params()), configs,
            jax.random.PRNGKey(6), nblocks=10, nsteps=10, energy_acc=acc,
            mesh=m,
        )
        N = np.mean([d["overlap"] for d in data[3:]], axis=0)
        e0s = [d["energy0_num"] / d["energy0_den"] for d in data[3:]]
        results[tag] = (N, np.mean(e0s), np.std(e0s, ddof=1) / np.sqrt(len(e0s)))
        assert out_configs.positions.shape == configs.positions.shape
    N1, e1, s1 = results["single"]
    N8, e8, s8 = results["sharded"]
    np.testing.assert_allclose(
        np.real(N8) / np.real(N8[0, 0]), np.real(N1) / np.real(N1[0, 0]),
        atol=0.1,
    )
    assert abs(e8 - e1) < 5 * np.hypot(s1, s8) + 0.01, (e1, e8, s1, s8)


def test_sample_overlap_pbc_wrap(h2_states):
    """Periodic overlap sampling threads the enforce_pbc wrap deltas: final
    positions are folded into the cell and the returned wrap array records
    the crossings (regression for the round-2 wrap-bookkeeping leak)."""
    from ..fixtures_pbc import load_cell
    from pyqmc_tpu.models.orbitals import KPointOrbitals
    from pyqmc_tpu.models.slater import DeterminantExpansion

    cell, d = load_cell("h_pbc_casscf")
    nocc = int(np.sum(np.asarray(d["mo_occ"]) > 0.5))
    C = np.asarray(d["mo_coeff"])[:, :nocc].astype(np.complex128)
    orb = KPointOrbitals(cell, np.zeros((1, 3)), ([C], [C]))
    wf = Slater(cell, orb, DeterminantExpansion.single(nocc, nocc))
    configs = initial_guess(cell, 50, key=jax.random.PRNGKey(7))
    data, out = sample_overlap(
        (wf, wf), (wf.make_params(), wf.make_params()), configs,
        jax.random.PRNGKey(8), nblocks=3, nsteps=10, tstep=1.0,
    )
    # positions stay folded: re-enforcing is the identity with zero delta
    folded, delta = out.geometry.enforce(jnp.asarray(out.positions))
    np.testing.assert_allclose(np.asarray(folded), out.positions, atol=1e-10)
    assert np.all(np.asarray(delta) == 0)
    # with tstep 1.0 on a small cell, some walker crossed a boundary and the
    # sweep recorded it (round 2 silently returned the original zeros)
    assert np.sum(np.abs(np.asarray(out.wrap))) > 0


def test_optimize_ensemble_sharded_and_restart(h2_states, tmp_path):
    """Ensemble optimization over an 8-device mesh with checkpoint/resume:
    a run killed after 2 iterations resumes at iteration 2 and reproduces
    the uninterrupted sharded trajectory; energies agree with the
    single-device run within stochastic error."""
    from pyqmc_tpu.parallel.mesh import walker_mesh
    import h5py

    mf, gs, ex = h2_states
    mol = mf.mol
    ca = mf.mo_coeff[0][:, :2]
    mesh = walker_mesh(8)
    acc = EnergyAccumulator(mol)

    def setup():
        mixed = Slater(
            mol, None,
            DeterminantExpansion(
                occ_up=np.array([[0], [1]]), occ_dn=np.array([[0]]),
                map_up=np.array([0, 1]), map_dn=np.array([0, 0]),
            ),
            (ca, ca), det_coeff=np.array([0.5, 0.8]),
        )
        t1 = LinearTransform(
            mixed.make_params(),
            {"det_coeff": True, "mo_coeff_alpha": False,
             "mo_coeff_beta": False},
        )
        configs = initial_guess(mol, 600, key=jax.random.PRNGKey(9))
        return (gs, mixed), (gs.make_params(), mixed.make_params()), (None, t1), configs

    kws = dict(key=jax.random.PRNGKey(10), penalty=4.0, tau=0.3,
               nblocks=3, nsteps=10)
    f1, f2 = str(tmp_path / "ens_split.h5"), str(tmp_path / "ens_full.h5")
    # interrupted sharded run: 2 iterations, then resume to 4
    wfs, ps, ts, configs = setup()
    optimize_ensemble(wfs, ps, ts, configs, acc, mesh=mesh, hdf_file=f1,
                      max_iterations=2, **kws)
    _, rec_resumed = optimize_ensemble(
        wfs, ps, ts, configs, acc, mesh=mesh, hdf_file=f1,
        max_iterations=4, **kws)
    assert [r["iteration"] for r in rec_resumed] == [2, 3]
    # uninterrupted sharded control
    wfs, ps, ts, configs = setup()
    params_full, rec_full = optimize_ensemble(
        wfs, ps, ts, configs, acc, mesh=mesh, hdf_file=f2,
        max_iterations=4, **kws)
    with h5py.File(f1, "r") as a, h5py.File(f2, "r") as b:
        assert len(a["x1"]) == len(b["x1"]) == 4
        np.testing.assert_allclose(
            np.asarray(a["x1"]), np.asarray(b["x1"]), rtol=1e-6, atol=1e-8)
    # single-device comparison: same optimization physics
    wfs, ps, ts, configs = setup()
    params_1dev, rec_1dev = optimize_ensemble(
        wfs, ps, ts, configs, acc, max_iterations=4, **kws)
    e_mesh = rec_full[-1]["energy1"]
    e_1dev = rec_1dev[-1]["energy1"]
    assert abs(e_mesh - e_1dev) < 0.1, (e_mesh, e_1dev)
    # restart with the wrong walker count raises an actionable error
    wfs, ps, ts, _ = setup()
    bad = initial_guess(mol, 320, key=jax.random.PRNGKey(11))
    with pytest.raises(ValueError, match="walker shape"):
        optimize_ensemble(wfs, ps, ts, bad, acc, mesh=mesh, hdf_file=f2,
                          max_iterations=5, **kws)


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
