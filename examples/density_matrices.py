import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
"""Reduced density matrices from VMC — molecular and periodic.

1. Molecular OBDM of He in the RHF MO basis: the occupied-occupied block
   approaches 1 (doubly occupied 1s), virtuals stay small.
2. Periodic OBDM/TBDM of a general-twist Li supercell in the k-point MO
   basis (KOBDMAccumulator / KTBDMAccumulator): both auxiliary
   coordinates are drawn from a wrapped atom-centered mixture with the
   exact image-sum density, so the estimators stay unbiased; both run on
   the complex path and the real-pair TPU tiers.
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

from pyqmc_tpu.api import (
    Molecule, run_scf, Slater, initial_guess, vmc,
    OBDMAccumulator, KOBDMAccumulator, KTBDMAccumulator,
    KPointOrbitals, DeterminantExpansion, PairKSlater, get_supercell,
)

# --- 1. molecular: He OBDM ------------------------------------------------
mf = run_scf(Molecule("He 0 0 0", basis="sto-3g"))
wf = Slater.from_mean_field(mf)
acc = OBDMAccumulator(mf.mol, mf.mo_coeff[0][:, :1])
configs = initial_guess(mf.mol, 800, key=jax.random.PRNGKey(0))
data, _ = vmc(wf, wf.make_params(), configs, nblocks=12, nsteps_per_block=10,
              accumulators={"obdm": acc}, key=jax.random.PRNGKey(1))
rho = np.mean([d["obdmvalue"] for d in data[4:]], axis=0)
print("He OBDM diagonal (MO basis):", np.round(np.diag(rho), 3))

# --- 2. periodic: general-twist Li supercell ------------------------------
from fixtures_pbc import load_cell

cell, d = load_cell("li_cubic_ccecp")
sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
kpts = np.asarray(d["kpts"]) + np.array([0.02, -0.01, 0.03])  # general twist
blocks = [np.asarray(d["mo_coeff"][k])[:, :1] for k in range(8)]
orb = KPointOrbitals(cell, kpts, (blocks, blocks), realify=False)
wf = PairKSlater(sup, orb, DeterminantExpansion.single(8, 8))
kobdm = KOBDMAccumulator(sup, orb, spin=0)
ktbdm = KTBDMAccumulator(sup, orb, spin=(0, 1))
configs = initial_guess(sup, 200, key=jax.random.PRNGKey(2))
data, _ = vmc(wf, wf.make_params(), configs, nblocks=8, nsteps_per_block=5,
              tstep=1.0, accumulators={"obdm": kobdm, "tbdm": ktbdm},
              key=jax.random.PRNGKey(3))
from pyqmc_tpu.observables.obdm import normalize_obdm

rho_re = np.mean([d["obdmvalue_re"] for d in data[3:]], axis=0)
rho2_re = np.mean([d["tbdmvalue_re"] for d in data[3:]], axis=0)
norm = np.mean([d["obdmnorm"] for d in data[3:]], axis=0)
# the fixture's k-MOs are normalized per PRIMITIVE cell; dividing by the
# sampled orbital norms recovers per-orbital occupancies ~1
rho_n = normalize_obdm(rho_re, norm)
print("periodic OBDM diag (normalized):", np.round(np.diag(rho_n), 3))
print("periodic TBDM_0000 (raw Re):", round(float(rho2_re[0, 0, 0, 0]), 4))
