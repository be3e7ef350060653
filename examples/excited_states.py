"""Excited-state (ensemble) optimization example: ground + first excited
state of H2 with an overlap penalty (reference ensemble workflow parity)."""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from pyqmc_tpu.api import (
    Molecule, run_scf, Slater, DeterminantExpansion, EnergyAccumulator,
    LinearTransform, optimize_ensemble, initial_guess,
)

mf = run_scf(Molecule("H 0 0 0; H 0 0 1.4", basis="ccpvdz"))
mol = mf.mol
gs = Slater.from_mean_field(mf)
ca = mf.mo_coeff[0][:, :2]
mixed = Slater(
    mol, None,
    DeterminantExpansion(
        occ_up=np.array([[0], [1]]), occ_dn=np.array([[0]]),
        map_up=np.array([0, 1]), map_dn=np.array([0, 0]),
    ),
    (ca, ca), det_coeff=np.array([0.5, 0.8]),
)
p1 = mixed.make_params()
t1 = LinearTransform(
    p1, {"det_coeff": True, "mo_coeff_alpha": False, "mo_coeff_beta": False}
)
configs = initial_guess(mol, 600, key=jax.random.PRNGKey(0))
params_list, records = optimize_ensemble(
    (gs, mixed), (gs.make_params(), p1), (None, t1), configs,
    EnergyAccumulator(mol), key=jax.random.PRNGKey(1),
    max_iterations=8, penalty=4.0, tau=0.3, verbose=True,
)
print("final excited-state det_coeff:", np.asarray(params_list[1]["det_coeff"]))
