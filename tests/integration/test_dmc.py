"""DMC: H atom ground state = -0.5 Ha exactly (within errorbars), mirroring
the reference's tests/integration/test_dmc.py:28-66 criterion."""

import numpy as np
import jax
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.models.jastrow import JastrowSpin
from pyqmc_tpu.models.multiply import MultiplyWF
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.method.dmc import rundmc
from pyqmc_tpu.configs import initial_guess


@pytest.mark.slow
def test_dmc_h_atom():
    mol = Molecule("H 0 0 0", basis="ccpvdz", spin=1)
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    params = wf.make_params()
    configs = initial_guess(mol, 400, key=jax.random.PRNGKey(0))
    acc = EnergyAccumulator(mol)
    data, configs, weights = rundmc(
        wf, params, configs, nblocks=60, nsteps_per_block=20, tstep=0.02,
        energy_acc=acc, key=jax.random.PRNGKey(1),
    )
    en = np.array([d["energytotal"] for d in data[20:]])
    mean = en.mean()
    sem = en.std(ddof=1) / np.sqrt(len(en))
    # H atom DMC is exact: E = -0.5 Ha; allow tstep bias + stochastic error
    assert abs(mean - (-0.5)) < max(5 * sem, 0.005), (mean, sem)
    # population stayed healthy
    w = np.array([d["weight"] for d in data[20:]])
    assert np.all(w > 0.5) and np.all(w < 2.0)


def test_dmc_smoke_he():
    """Short smoke run: finite energies, weights controlled."""
    mol = Molecule("He 0 0 0", basis="sto-3g")
    mf = run_scf(mol)
    wf = MultiplyWF(Slater.from_mean_field(mf), JastrowSpin(mol))
    params = wf.make_params()
    configs = initial_guess(mol, 100, key=jax.random.PRNGKey(2))
    acc = EnergyAccumulator(mol)
    data, configs, weights = rundmc(
        wf, params, configs, nblocks=5, nsteps_per_block=5, tstep=0.02,
        energy_acc=acc, key=jax.random.PRNGKey(3), warmup_vmc_blocks=2,
    )
    for d in data:
        assert np.isfinite(d["energytotal"])
    assert np.all(np.isfinite(weights))


def test_dmc_sharded_smoke():
    mol = Molecule("He 0 0 0", basis="sto-3g")
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    mesh = jax.make_mesh((len(jax.devices()),), ("walkers",))
    configs = initial_guess(mol, 16 * len(jax.devices()), key=jax.random.PRNGKey(4))
    acc = EnergyAccumulator(mol)
    data, configs, weights = rundmc(
        wf, wf.make_params(), configs, nblocks=3, nsteps_per_block=4,
        tstep=0.02, energy_acc=acc, key=jax.random.PRNGKey(5), mesh=mesh,
        warmup_vmc_blocks=2,
    )
    assert np.isfinite(data[-1]["energytotal"])


@pytest.mark.slow
def test_dmc_sharded_matches_single():
    """Per-shard comb branching with globally normalized weights must give
    the same physics as the single-device comb (H atom, exact -0.5)."""
    mol = Molecule("H 0 0 0", basis="ccpvdz", spin=1)
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    acc = EnergyAccumulator(mol)
    res = {}
    for name, mesh in (
        ("single", None),
        ("sharded", jax.make_mesh((len(jax.devices()),), ("walkers",))),
    ):
        configs = initial_guess(mol, 400, key=jax.random.PRNGKey(0))
        d, _, _ = rundmc(
            wf, wf.make_params(), configs, nblocks=40, nsteps_per_block=20,
            tstep=0.02, energy_acc=acc, key=jax.random.PRNGKey(1),
            warmup_vmc_blocks=3, mesh=mesh,
        )
        en = np.array([x["energytotal"] for x in d[15:]])
        res[name] = (en.mean(), en.std(ddof=1) / np.sqrt(len(en)))
    z = abs(res["single"][0] - res["sharded"][0]) / np.hypot(
        res["single"][1], res["sharded"][1]
    )
    assert z < 4.0, res
    for name in res:
        assert abs(res[name][0] - (-0.5)) < max(5 * res[name][1], 0.005), res


def test_dmc_pipelined_matches_synchronous():
    """The hdf_file=None path runs population control on-device (lag-1
    pipelined dispatch); with branching disabled the walker trajectories
    must match the synchronous checkpointing path to f32 rounding."""
    import os, tempfile

    mol = Molecule("He 0 0 0", basis="sto-3g")
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    params = wf.make_params()
    acc = EnergyAccumulator(mol)
    kws = dict(nblocks=3, nsteps_per_block=4, tstep=0.02, energy_acc=acc,
               warmup_vmc_blocks=2, branchtime=100)
    configs = initial_guess(mol, 64, key=jax.random.PRNGKey(7))
    d_pipe, _, _ = rundmc(wf, params, configs, key=jax.random.PRNGKey(8),
                          **kws)
    with tempfile.TemporaryDirectory() as td:
        d_sync, _, _ = rundmc(
            wf, params, configs, key=jax.random.PRNGKey(8),
            hdf_file=os.path.join(td, "dmc.h5"), **kws)
    e_pipe = np.array([d["energytotal"] for d in d_pipe])
    e_sync = np.array([d["energytotal"] for d in d_sync])
    np.testing.assert_allclose(e_pipe, e_sync, rtol=2e-4)
    # the on-device feedback must track the host-side formula
    t_pipe = np.array([d["e_trial"] for d in d_pipe], dtype=float)
    t_sync = np.array([d["e_trial"] for d in d_sync], dtype=float)
    np.testing.assert_allclose(t_pipe, t_sync, atol=2e-3)
