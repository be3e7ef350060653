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
