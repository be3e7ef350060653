"""VMC end-to-end: Slater sampling must reproduce the SCF energy
(mirrors reference tests/integration/test_vmc.py:53-55 criterion)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.models.jastrow import JastrowSpin
from pyqmc_tpu.models.multiply import MultiplyWF
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.method.vmc import vmc
from pyqmc_tpu.configs import initial_guess


def run_and_stats(mol, wf, params, nconf=400, nblocks=24, warmup=8, **kw):
    configs = initial_guess(mol, nconf, key=jax.random.PRNGKey(10))
    acc = {"energy": EnergyAccumulator(mol)}
    data, configs = vmc(
        wf, params, configs, nblocks=nblocks, nsteps_per_block=10,
        accumulators=acc, key=jax.random.PRNGKey(11), **kw,
    )
    en = np.array([d["energytotal"] for d in data[warmup:]])
    return en.mean(), en.std(ddof=1) / np.sqrt(len(en)), data


def test_vmc_he_slater():
    mol = Molecule("He 0 0 0", basis="sto-3g")
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    emean, esem, data = run_and_stats(mol, wf, wf.make_params())
    acc = np.mean([d["acceptance"] for d in data])
    assert 0.3 < acc < 1.0
    assert abs(emean - mf.e_tot) < 5 * max(esem, 1e-4), (emean, mf.e_tot, esem)


def test_vmc_h2_slater_jastrow_below_hf():
    """With an e-e cusp Jastrow the VMC energy must drop below HF."""
    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")
    mf = run_scf(mol)
    slater = Slater.from_mean_field(mf)
    jas = JastrowSpin(mol)
    wf = MultiplyWF(slater, jas)
    params = wf.make_params()
    emean, esem, _ = run_and_stats(mol, wf, params, nconf=600, nblocks=30)
    # cusp-only Jastrow lowers the energy below HF
    assert emean < mf.e_tot + 3 * esem, (emean, mf.e_tot, esem)
    assert emean > -1.5  # sanity: above exact+correlation bound


def test_vmc_sharded_mesh_matches():
    """Same physics on an 8-device mesh; walker axis sharded."""
    mol = Molecule("He 0 0 0", basis="sto-3g")
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    mesh = jax.make_mesh((len(jax.devices()),), ("walkers",))
    emean, esem, _ = run_and_stats(mol, wf, wf.make_params(), nconf=512, mesh=mesh)
    assert abs(emean - mf.e_tot) < 5 * max(esem, 1e-4), (emean, mf.e_tot, esem)


def test_vmc_hdf5_checkpoint(tmp_path):
    mol = Molecule("He 0 0 0", basis="sto-3g")
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    configs = initial_guess(mol, 50, key=jax.random.PRNGKey(1))
    hdf = str(tmp_path / "vmc.h5")
    data, _ = vmc(
        wf, wf.make_params(), configs, nblocks=4, nsteps_per_block=5,
        accumulators={"energy": EnergyAccumulator(mol)},
        key=jax.random.PRNGKey(2), hdf_file=hdf,
    )
    import h5py

    with h5py.File(hdf, "r") as f:
        assert f["energytotal"].shape[0] == 4
        assert f["configs/positions"].shape == (50, 2, 3)


def test_profiling_hooks(tmp_path):
    """profile_phases attaches a move/accumulate split; profile_dir writes
    an XProf trace of the first block."""
    import os

    mol = Molecule("He 0 0 0", basis="sto-3g")
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    configs = initial_guess(mol, 64, key=jax.random.PRNGKey(0))
    tracedir = str(tmp_path / "trace")
    data, _ = vmc(
        wf, wf.make_params(), configs, nblocks=2, nsteps_per_block=4,
        accumulators={"energy": EnergyAccumulator(mol)},
        key=jax.random.PRNGKey(1),
        profile_phases=True, profile_dir=tracedir,
    )
    for d in data:
        assert "move time" in d and "accumulate time" in d
        assert d["move time"] >= 0 and d["accumulate time"] >= 0
    # the trace directory must contain profiler output
    found = []
    for root, _, files in os.walk(tracedir):
        found += files
    assert found, "no profiler trace written"
