import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
"""Checkpoint/restart workflow (counterpart of the reference's
examples/workflow/h2_restarts_example.py).

Every driver writes its full state to its HDF5 file as it runs; calling it
again with the same file resumes where it stopped:

  * OPTIMIZE/line_minimization: parameters + walkers + iteration counter,
  * VMC: walkers + block counter,
  * DMC: walkers + weights + e_trial/e_est + block counter.

Run this script, kill it at any point, run it again — it picks up.
"""

import numpy as np

from pyqmc_tpu.api import Molecule, OPTIMIZE, VMC, DMC, read_mc_output

mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")

# each call resumes from its file if it exists (and is a no-op once the
# requested number of iterations/blocks is already in the file)
wf, params, records = OPTIMIZE(
    mol, output="h2_opt.h5", nconfig=600, max_iterations=12, verbose=True
)
print(f"optimization: {len(records)} iterations recorded")

data, configs = VMC(
    mol, output="h2_vmc.h5", load_parameters="h2_opt.h5",
    nconfig=1200, nblocks=40, verbose=True,
)
print("VMC:", read_mc_output("h2_vmc.h5", warmup=8))

data, configs, weights = DMC(
    mol, output="h2_dmc.h5", load_parameters="h2_opt.h5",
    nconfig=1200, nblocks=80, tstep=0.02, verbose=True,
)
print("DMC:", read_mc_output("h2_dmc.h5", warmup=20))
