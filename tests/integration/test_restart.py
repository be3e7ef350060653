"""Checkpoint/restart continuity for VMC and DMC (mirrors reference
test_dmc.py:67 and the h2_restarts example workflow)."""

import numpy as np
import h5py
import jax
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.method.vmc import vmc
from pyqmc_tpu.method.dmc import rundmc
from pyqmc_tpu.configs import initial_guess


@pytest.fixture(scope="module")
def he():
    mol = Molecule("He 0 0 0", basis="sto-3g")
    mf = run_scf(mol)
    return mol, Slater.from_mean_field(mf)


def test_vmc_continue(he, tmp_path):
    mol, wf = he
    f = str(tmp_path / "vmc.h5")
    params = wf.make_params()
    acc = {"energy": EnergyAccumulator(mol)}
    configs = initial_guess(mol, 60, key=jax.random.PRNGKey(0))
    vmc(wf, params, configs, nblocks=3, nsteps_per_block=5,
        accumulators=acc, key=jax.random.PRNGKey(1), hdf_file=f)
    # second call continues: blocks 3..5 appended, configs reloaded
    vmc(wf, params, configs, nblocks=3, nsteps_per_block=5,
        accumulators=acc, key=jax.random.PRNGKey(1), hdf_file=f)
    with h5py.File(f, "r") as h:
        blocks = np.asarray(h["block"])
        assert list(blocks) == [0, 1, 2, 3, 4, 5]


def test_dmc_restart(he, tmp_path):
    mol, wf = he
    f = str(tmp_path / "dmc.h5")
    params = wf.make_params()
    acc = EnergyAccumulator(mol)
    configs = initial_guess(mol, 80, key=jax.random.PRNGKey(2))
    d1, c1, w1 = rundmc(wf, params, configs, nblocks=4, nsteps_per_block=5,
                        tstep=0.02, energy_acc=acc, key=jax.random.PRNGKey(3),
                        hdf_file=f, warmup_vmc_blocks=2)
    d2, c2, w2 = rundmc(wf, params, configs, nblocks=4, nsteps_per_block=5,
                        tstep=0.02, energy_acc=acc, key=jax.random.PRNGKey(3),
                        hdf_file=f, warmup_vmc_blocks=2)
    with h5py.File(f, "r") as h:
        blocks = np.asarray(h["block"])
        assert list(blocks) == list(range(8))
        # e_trial history continuous (no reset to warmup estimate)
        et = np.asarray(h["e_trial"])
        assert np.all(np.isfinite(et)) and len(et) == 8
    # energies from the restarted half remain sane
    en2 = [d["energytotal"] for d in d2]
    assert np.all(np.isfinite(en2))


def test_linemin_restart(he, tmp_path):
    """Optimization restart (reference linemin.py:162-189): a run killed
    after k iterations resumes at iteration k with the saved parameters and
    walkers, and produces the same trajectory as an uninterrupted run."""
    from pyqmc_tpu.models.jastrow import JastrowSpin
    from pyqmc_tpu.models.multiply import MultiplyWF
    from pyqmc_tpu.observables.transform import LinearTransform
    from pyqmc_tpu.method.linemin import line_minimization

    mol, slater = he
    f1 = str(tmp_path / "opt_split.h5")
    f2 = str(tmp_path / "opt_full.h5")

    def setup():
        wf = MultiplyWF(slater, JastrowSpin(mol))
        params = wf.make_params()
        to_opt = {"wf0": False, "wf1": True}
        lt = LinearTransform(params, to_opt)
        configs = initial_guess(mol, 100, key=jax.random.PRNGKey(4))
        return wf, params, lt, configs

    kws = dict(vmc_blocks=4, vmc_steps_per_block=5, key=jax.random.PRNGKey(5))
    # interrupted run: 2 iterations, then resume to 4
    wf, params, lt, configs = setup()
    acc = EnergyAccumulator(mol)
    line_minimization(wf, params, configs, lt, acc,
                      max_iterations=2, hdf_file=f1, **kws)
    p_resumed, _, rec_resumed = line_minimization(
        wf, params, configs, lt, acc, max_iterations=4, hdf_file=f1, **kws)
    # resumed run only executed iterations 2..3
    assert [r["iteration"] for r in rec_resumed] == [2, 3]
    # uninterrupted control
    wf, params, lt, configs = setup()
    p_full, _, rec_full = line_minimization(
        wf, params, configs, lt, acc, max_iterations=4, hdf_file=f2, **kws)
    with h5py.File(f1, "r") as a, h5py.File(f2, "r") as b:
        assert len(a["energy"]) == len(b["energy"]) == 4
        # identical trajectory: same per-iteration RNG stream + checkpointed
        # walkers make resume bit-reproducible
        np.testing.assert_allclose(
            np.asarray(a["x"]), np.asarray(b["x"]), rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(a["energy"])[2:], np.asarray(b["energy"])[2:],
            rtol=1e-6)
