import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
"""Twist-averaged VMC on a periodic supercell (counterpart of the
reference's examples/trial_wf/supercell_twist.py).

Uses the bundled Li bcc ccECP fixture (a converged k-point SCF extracted to
.npz) — the same input a pyscf KRHF run would provide. TRIM twists run in
real arithmetic automatically; general twists use the real-pair evaluators
(see doc/wavefunction.md).
"""

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from fixtures_pbc import load_cell

from pyqmc_tpu.api import (
    get_supercell, create_supercell_twists, twist_average_vmc,
    EnergyAccumulator, initial_guess,
)

cell, d = load_cell("li_cubic_ccecp")
sup = get_supercell(cell, np.eye(3, dtype=int))  # primitive cell, 8 twists
kpts = np.asarray(d["kpts"])
twists = create_supercell_twists(sup, kpts)
print(f"{len(twists)} supercell twists")

mo = ([np.asarray(d["mo_coeff"][k]) for k in range(len(kpts))],) * 2
occ = ([np.asarray(d["mo_occ"][k]) / 2.0 for k in range(len(kpts))],) * 2

records, avg = twist_average_vmc(
    cell, sup, kpts, mo, occ,
    configs_factory=lambda i: initial_guess(
        sup, 400, key=jax.random.PRNGKey(100 + i)
    ),
    accumulators_factory=lambda: {"energy": EnergyAccumulator(sup)},
    key=jax.random.PRNGKey(0),
    nblocks=15, nsteps_per_block=10, tstep=1.0, verbose=True,
)
per_twist = [
    np.mean([b["energytotal"] for b in r["data"][3:]]) for r in records
]
print("per-twist energies:", np.round(per_twist, 5))
print(f"twist-averaged E = {avg['energytotal']:.5f} "
      f"+/- {avg['energytotal_err']:.5f} Ha/cell")
