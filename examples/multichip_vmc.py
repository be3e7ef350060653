import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
"""Walker-parallel VMC over a device mesh.

On a TPU pod slice this runs one block as a single SPMD program per chip
with psum-reduced averages; on CPU set
XLA_FLAGS=--xla_force_host_platform_device_count=8 to emulate 8 devices.
"""

import jax
import numpy as np

from pyqmc_tpu.api import (
    Molecule, run_scf, Slater, EnergyAccumulator, vmc, initial_guess,
)

mol = Molecule("He 0 0 0", basis="sto-3g")
mf = run_scf(mol)
wf = Slater.from_mean_field(mf)

ndev = len(jax.devices())
mesh = jax.make_mesh((ndev,), ("walkers",))
configs = initial_guess(mol, 512 * ndev, key=jax.random.PRNGKey(0))
data, configs = vmc(
    wf, wf.make_params(), configs, nblocks=20, nsteps_per_block=10,
    accumulators={"energy": EnergyAccumulator(mol)},
    key=jax.random.PRNGKey(1), mesh=mesh, verbose=True,
)
en = np.array([d["energytotal"] for d in data[5:]])
print(f"E = {en.mean():.5f} +/- {en.std(ddof=1)/np.sqrt(len(en)):.5f} "
      f"(HF = {mf.e_tot:.5f}) on {ndev} devices")
