import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
"""Profiling a VMC run (counterpart of the reference's
examples/performance/performance_profile.py).

Two tools:
  * profile_phases=True — compiles a move-only variant of the block kernel
    and reports the move/accumulate wall-time split (the whole block is one
    fused XLA program, so the split can't be read off the host clock).
  * profile_dir="..." — writes a jax.profiler trace of the first block;
    open with XProf/TensorBoard to see the on-device per-op timeline.
"""

import jax
import numpy as np

from pyqmc_tpu.api import (
    Molecule, run_scf, Slater, EnergyAccumulator, vmc, initial_guess,
)

mol = Molecule(
    "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
    basis="ccecpccpvdz", ecp="ccecp",
)
mf = run_scf(mol)
wf = Slater.from_mean_field(mf)
configs = initial_guess(mol, 2048, key=jax.random.PRNGKey(0))

data, configs = vmc(
    wf, wf.make_params(), configs, nblocks=10, nsteps_per_block=20,
    accumulators={"energy": EnergyAccumulator(mol)},
    key=jax.random.PRNGKey(1), verbose=True,
    profile_phases=True,          # move vs accumulate split
    profile_dir="vmc_trace",      # XProf trace of the first block
)
d = data[-1]
steps = 2048 * 20
print(f"move     : {d['move time']*1e3:8.1f} ms/block")
print(f"accumulate: {d['accumulate time']*1e3:8.1f} ms/block")
print(f"throughput: {steps / d['block time'] / 1e3:.0f}k walker-steps/s")
print("trace written to ./vmc_trace (open with tensorboard --logdir)")
