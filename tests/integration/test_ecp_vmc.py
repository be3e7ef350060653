"""ECP in full VMC sampling: Li ccECP (one valence electron) — VMC(Slater)
must reproduce the ECP-SCF energy exactly in expectation."""

import numpy as np
import jax
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.observables.ecp import ECPAccumulator
from pyqmc_tpu.method.vmc import vmc
from pyqmc_tpu.configs import initial_guess


def test_li_ccecp_vmc():
    mol = Molecule("Li 0 0 0", basis="ccecpccpvdz", ecp="ccecp", spin=1)
    mf = run_scf(mol)
    # exact radial solve gives -0.196853; the augmented VDZ basis reaches it
    # to ~2e-4
    assert abs(mf.e_tot - (-0.19685)) < 5e-4
    wf = Slater.from_mean_field(mf)
    params = wf.make_params()
    configs = initial_guess(mol, 800, key=jax.random.PRNGKey(0))
    acc = {"energy": EnergyAccumulator(mol, ecp_acc=ECPAccumulator(mol, naip=6))}
    data, configs = vmc(
        wf, params, configs, nblocks=30, nsteps_per_block=10, tstep=0.8,
        accumulators=acc, key=jax.random.PRNGKey(1),
    )
    en = np.array([d["energytotal"] for d in data[10:]])
    mean = en.mean()
    sem = en.std(ddof=1) / np.sqrt(len(en))
    assert abs(mean - mf.e_tot) < 5 * max(sem, 2e-4), (mean, mf.e_tot, sem)
    # nonzero ecp contribution actually flowed through
    ecps = np.array([d["energyecp"] for d in data[10:]])
    assert np.all(np.abs(ecps) > 1e-4)
