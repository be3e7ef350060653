import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
"""Slater x geminal-Jastrow optimization through the factory interface
(counterpart of the reference's examples/trial_wf/slater_geminal.py).

generate_wf accepts any jastrow factory callable — here the AO-pair
geminal Jastrow U = sum_{i<j} chi(r_i)^T g chi(r_j); swap in
generate_gps_jastrow for the Gaussian-process-state form, or pass a list
of factories to multiply several correlation factors.
"""

import jax
import numpy as np

from pyqmc_tpu.api import (
    Molecule, run_scf, generate_wf, generate_geminal_jastrow,
    generate_jastrow, EnergyAccumulator, LinearTransform,
    line_minimization, vmc, initial_guess,
)

mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")
mf = run_scf(mol)

# two-body cusp Jastrow x geminal, both optimized
wf, params, to_opt = generate_wf(
    mol, mf, jastrow=[generate_jastrow, generate_geminal_jastrow]
)
transform = LinearTransform(params, to_opt)
print(f"{transform.nparams} optimizable parameters")

configs = initial_guess(mol, 800, key=jax.random.PRNGKey(0))
acc = EnergyAccumulator(mol)
_, configs = vmc(wf, params, configs, nblocks=5, nsteps_per_block=10,
                 key=jax.random.PRNGKey(1))
params, configs, records = line_minimization(
    wf, params, configs, transform, acc, key=jax.random.PRNGKey(2),
    max_iterations=15, verbose=True,
)
print(f"energy: {records[0]['energy']:.5f} -> {records[-1]['energy']:.5f} "
      f"(HF = {mf.e_tot:.5f}, exact = -1.1745)")
