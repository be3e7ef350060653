"""DMC with ECP T-moves: Li ccECP one-electron system.

For a one-electron atom DMC is exact within the fixed basis/potential; the
exact radial-solve reference for this ccECP is -0.19685 (see test_ecp.py
derivation); DMC must land below the basis-limited SCF (-0.15783) and near
the exact value."""

import numpy as np
import jax
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.observables.ecp import ECPAccumulator
from pyqmc_tpu.method.dmc import rundmc
from pyqmc_tpu.configs import initial_guess


@pytest.mark.slow
def test_dmc_tmoves_li():
    mol = Molecule("Li 0 0 0", basis="ccecpccpvdz", ecp="ccecp", spin=1)
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    acc = EnergyAccumulator(mol, ecp_acc=ECPAccumulator(mol, naip=6))
    configs = initial_guess(mol, 300, key=jax.random.PRNGKey(0))
    data, configs, weights = rundmc(
        wf, wf.make_params(), configs, nblocks=40, nsteps_per_block=20,
        tstep=0.05, energy_acc=acc, key=jax.random.PRNGKey(1),
        warmup_vmc_blocks=4,
    )
    en = np.array([d["energytotal"] for d in data[15:]])
    mean = en.mean()
    sem = en.std(ddof=1) / np.sqrt(len(en))
    # T-move DMC projects toward the exact ground state of the ECP (-0.19685)
    # far below the VDZ-contraction-limited SCF value (-0.15783)
    assert mean < -0.17, (mean, sem)
    assert mean > -0.22, (mean, sem)
    w = np.array([d["weight"] for d in data[15:]])
    assert np.all(w > 0.5) and np.all(w < 2.0)
