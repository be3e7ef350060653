import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
"""H2O Slater-Jastrow: optimize then measure (counterpart of the reference's
recipes workflow)."""

import jax
import numpy as np

from pyqmc_tpu.api import Molecule, OPTIMIZE, VMC, read_mc_output

mol = Molecule(
    "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867", basis="sto-3g"
)
wf, params, records = OPTIMIZE(
    mol, output="h2o_opt.h5", nconfig=800, max_iterations=10, verbose=True
)
data, configs = VMC(
    mol, output="h2o_vmc.h5", load_parameters="h2o_opt.h5",
    nconfig=2000, nblocks=60, verbose=True,
)
print(read_mc_output("h2o_vmc.h5", warmup=10))
