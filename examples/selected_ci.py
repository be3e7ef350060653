import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
"""Multi-determinant trial wavefunctions from selected CI (counterpart of
the reference's examples/trial_wf/selected_ci.py).

Three routes to a determinant expansion:
  1. built-in exact CASCI (system/casci.run_casci),
  2. built-in heat-bath selected CI (system/casci.run_hci),
  3. import from an external CI code via bitstrings (system/ci_import) —
     any program that can dump (coefficient, up-string, dn-string) rows.
"""

import numpy as np
import jax

from pyqmc_tpu.api import (
    Molecule, run_scf, generate_slater, generate_jastrow, MultiplyWF,
    run_casci, run_hci, determinants_from_bitstrings,
    expansion_from_determinants, EnergyAccumulator, vmc, initial_guess,
)

mol = Molecule("Li 0 0 0; H 0 0 3.015", basis="sto-3g")
mf = run_scf(mol)
print(f"RHF: {mf.e_tot:.6f}")

# --- route 1: exact CASCI(4, 2e) --------------------------------------
e_casci, roots = run_casci(mf, ncas=4, nelecas=(1, 1), nroots=1)
print(f"CASCI(2e,4o): {e_casci[0]:.6f}")
wf_casci = generate_slater(mol, mf, mc=roots[0])

# --- route 2: heat-bath selected CI ------------------------------------
e_hci, roots_hci = run_hci(mf, ncas=4, nelecas=(1, 1), eps1=1e-4)
exp, coeff = roots_hci[0]
print(f"HCI: {e_hci[0]:.6f} with {len(coeff)} determinants")

# --- route 3: external determinants as bitstrings ----------------------
# (as dumped by Dice/Arrow/pyscf-HCI style codes; orbital 0 = rightmost bit)
dets = determinants_from_bitstrings(
    [(0.993, "0001", "0001"), (-0.115, "0010", "0010")], ncore=1
)
wf_ext = generate_slater(mol, mf, mc=expansion_from_determinants(dets))

# measure the CASCI trial (multiply by a Jastrow for a real calculation)
jas, _ = generate_jastrow(mol)
wf = MultiplyWF(wf_casci, jas)
configs = initial_guess(mol, 800, key=jax.random.PRNGKey(0))
data, configs = vmc(
    wf, wf.make_params(), configs, nblocks=30, nsteps_per_block=10,
    accumulators={"energy": EnergyAccumulator(mol)},
    key=jax.random.PRNGKey(1), verbose=True,
)
en = np.array([d["energytotal"] for d in data[8:]])
print(f"multi-det SJ VMC: {en.mean():.5f} +/- "
      f"{en.std(ddof=1)/np.sqrt(len(en)):.5f}")
