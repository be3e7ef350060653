"""Failure-detection guards: correlated-sampling stall handling and
checkpoint-compatibility validation (VERDICT r2 items 8 and 9)."""

import logging

import numpy as np
import h5py
import jax
import pytest

from pyqmc_tpu.method.linemin import select_candidate


def test_select_candidate_picks_lowest_trusted():
    energies = np.array([-1.0, -1.2, -5.0])
    ess = np.array([0.9, 0.8, 0.05])  # the -5.0 estimate is garbage
    best, taus = select_candidate(energies, ess, [0.0, 0.1, 0.4])
    assert best == 1
    assert taus == [0.0, 0.1, 0.4]


def test_select_candidate_stall_halves_taus(caplog):
    """Pathological candidate set: every ESS below threshold -> warning,
    best=None, halved tau grid (no silent tau=0 step)."""
    energies = np.array([-8.0, -9.0, -10.0])
    ess = np.array([0.02, 0.01, 0.005])
    with caplog.at_level(logging.WARNING):
        best, taus = select_candidate(energies, ess, [0.0, 0.2, 0.4],
                                      iteration=3)
    assert best is None
    assert taus == [0.0, 0.1, 0.2]
    assert any("rejected" in r.message for r in caplog.records)


@pytest.fixture(scope="module")
def he_run(tmp_path_factory):
    from pyqmc_tpu.system.mole import Molecule
    from pyqmc_tpu.system.scf import run_scf
    from pyqmc_tpu.models.slater import Slater
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.method.vmc import vmc
    from pyqmc_tpu.configs import initial_guess

    mol = Molecule("He 0 0 0", basis="sto-3g")
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    params = wf.make_params()
    acc = {"energy": EnergyAccumulator(mol)}
    f = str(tmp_path_factory.mktemp("ckpt") / "vmc.h5")
    configs = initial_guess(mol, 64, key=jax.random.PRNGKey(0))
    vmc(wf, params, configs, nblocks=2, nsteps_per_block=3,
        accumulators=acc, key=jax.random.PRNGKey(1), hdf_file=f)
    return mol, wf, params, acc, f


def test_vmc_resume_wrong_nconfig_raises(he_run):
    from pyqmc_tpu.method.vmc import vmc
    from pyqmc_tpu.configs import initial_guess

    mol, wf, params, acc, f = he_run
    bad = initial_guess(mol, 48, key=jax.random.PRNGKey(2))
    with pytest.raises(ValueError, match="walker shape"):
        vmc(wf, params, bad, nblocks=1, nsteps_per_block=3,
            accumulators=acc, key=jax.random.PRNGKey(3), hdf_file=f)


def test_vmc_continue_from_forks(he_run, tmp_path):
    """continue_from loads walkers from another run's checkpoint, restarts
    the block counter, and refuses to overwrite an existing output."""
    from pyqmc_tpu.method.vmc import vmc
    from pyqmc_tpu.configs import initial_guess

    mol, wf, params, acc, f = he_run
    configs = initial_guess(mol, 64, key=jax.random.PRNGKey(4))
    out = str(tmp_path / "fork.h5")
    data, _ = vmc(wf, params, configs, nblocks=2, nsteps_per_block=3,
                  accumulators=acc, key=jax.random.PRNGKey(5),
                  hdf_file=out, continue_from=f)
    with h5py.File(out, "r") as h:
        assert list(np.asarray(h["block"])) == [0, 1]
    # overwrite guard: output exists now
    with pytest.raises(ValueError, match="refusing to overwrite"):
        vmc(wf, params, configs, nblocks=1, nsteps_per_block=3,
            accumulators=acc, hdf_file=out, continue_from=f)


def test_dmc_restart_wrong_nconfig_raises(he_run, tmp_path):
    from pyqmc_tpu.method.dmc import rundmc
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.configs import initial_guess

    mol, wf, params, acc, _ = he_run
    f = str(tmp_path / "dmc.h5")
    configs = initial_guess(mol, 64, key=jax.random.PRNGKey(6))
    eacc = EnergyAccumulator(mol)
    rundmc(wf, params, configs, nblocks=2, nsteps_per_block=3, tstep=0.02,
           energy_acc=eacc, key=jax.random.PRNGKey(7), hdf_file=f,
           warmup_vmc_blocks=1)
    bad = initial_guess(mol, 48, key=jax.random.PRNGKey(8))
    with pytest.raises(ValueError, match="walker shape"):
        rundmc(wf, params, bad, nblocks=1, nsteps_per_block=3, tstep=0.02,
               energy_acc=eacc, key=jax.random.PRNGKey(9), hdf_file=f,
               warmup_vmc_blocks=1)


def test_update_tau_grid_regrows_after_recovery():
    """A stall-halved grid doubles back toward the original after
    tau_recover clean iterations, and never overshoots it (VERDICT r3
    weak #7: the halved grid used to ratchet down permanently)."""
    from pyqmc_tpu.method.linemin import update_tau_grid

    taus0 = [0.0, 0.2, 0.4]
    quartered = [0.0, 0.05, 0.1]
    # first clean iteration: streak builds, no regrowth yet
    taus, streak = update_tau_grid(quartered, taus0, 0, stalled=False,
                                   tau_recover=2)
    assert taus == quartered and streak == 1
    # second clean iteration: doubled once
    taus, streak = update_tau_grid(taus, taus0, streak, stalled=False,
                                   tau_recover=2)
    assert taus == [0.0, 0.1, 0.2] and streak == 0
    # two more clean iterations: back at the original grid exactly
    taus, streak = update_tau_grid(taus, taus0, streak, stalled=False)
    taus, streak = update_tau_grid(taus, taus0, streak, stalled=False)
    assert taus == taus0
    # at the original grid, further clean iterations leave it fixed
    taus, streak = update_tau_grid(taus, taus0, streak, stalled=False)
    taus, streak = update_tau_grid(taus, taus0, streak, stalled=False)
    assert taus == taus0
    # a stall resets the streak
    _, streak = update_tau_grid(taus, taus0, 1, stalled=True)
    assert streak == 0


def test_dmc_restart_on_vmc_file_raises(he_run):
    """Pointing rundmc at a VMC output (configs, no weights) raises a named
    error instead of TypeError (VERDICT r3 weak #1)."""
    from pyqmc_tpu.method.dmc import rundmc
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.configs import initial_guess

    mol, wf, params, acc, vmc_file = he_run
    configs = initial_guess(mol, 64, key=jax.random.PRNGKey(10))
    with pytest.raises(ValueError, match="not a DMC checkpoint"):
        rundmc(wf, params, configs, nblocks=1, nsteps_per_block=3,
               tstep=0.02, energy_acc=EnergyAccumulator(mol),
               key=jax.random.PRNGKey(11), hdf_file=vmc_file,
               warmup_vmc_blocks=1)


def test_dmc_restart_on_opt_file_raises(he_run, tmp_path):
    from pyqmc_tpu.method.dmc import rundmc
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.configs import initial_guess

    mol, wf, params, acc, _ = he_run
    f = str(tmp_path / "opt.h5")
    with h5py.File(f, "w") as h:  # optimization-shaped file
        h.create_dataset("x", data=np.zeros((3, 7)))
        h.create_dataset("energy", data=np.zeros(3))
    configs = initial_guess(mol, 64, key=jax.random.PRNGKey(12))
    with pytest.raises(ValueError, match="not a DMC checkpoint"):
        rundmc(wf, params, configs, nblocks=1, nsteps_per_block=3,
               tstep=0.02, energy_acc=EnergyAccumulator(mol),
               key=jax.random.PRNGKey(13), hdf_file=f, warmup_vmc_blocks=1)


def test_dmc_restart_empty_file_starts_fresh(he_run, tmp_path):
    """An empty HDF5 file (created then killed before the first block)
    starts a fresh run rather than crashing."""
    from pyqmc_tpu.method.dmc import rundmc
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.configs import initial_guess

    mol, wf, params, acc, _ = he_run
    f = str(tmp_path / "empty.h5")
    with h5py.File(f, "w"):
        pass
    configs = initial_guess(mol, 64, key=jax.random.PRNGKey(14))
    data, _, _ = rundmc(wf, params, configs, nblocks=1, nsteps_per_block=3,
                        tstep=0.02, energy_acc=EnergyAccumulator(mol),
                        key=jax.random.PRNGKey(15), hdf_file=f,
                        warmup_vmc_blocks=1)
    assert np.isfinite(data[0]["energytotal"])
    with h5py.File(f, "r") as h:
        assert "weights" in h and "configs" in h


def test_correlated_nconf_validation(he_run):
    """correlated_nconf out of range or not mesh-divisible raises a named
    error up front (VERDICT r3 weak #8)."""
    from pyqmc_tpu.method.linemin import line_minimization
    from pyqmc_tpu.observables.transform import LinearTransform
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.parallel.mesh import walker_mesh
    from pyqmc_tpu.configs import initial_guess

    mol, wf, params, acc, _ = he_run
    lt = LinearTransform(params, {"mo_coeff_alpha": False, "mo_coeff_beta": False, "det_coeff": True})
    eacc = EnergyAccumulator(mol)
    configs = initial_guess(mol, 64, key=jax.random.PRNGKey(16))
    with pytest.raises(ValueError, match="must be in"):
        line_minimization(wf, params, configs, lt, eacc,
                          correlated_nconf=128, max_iterations=1)
    mesh = walker_mesh()
    if mesh.devices.size > 1:
        with pytest.raises(ValueError, match="does not divide"):
            line_minimization(wf, params, configs, lt, eacc, mesh=mesh,
                              correlated_nconf=mesh.devices.size + 1,
                              max_iterations=1)
