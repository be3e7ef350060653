import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
"""Optimize a general-twist (non-TRIM) multi-determinant wavefunction on a
real-only backend (TPU tiers) — the fixed-phase analogue of the reference's
tests/integration/test_complex_linemin.py workflow.

The PairKSlater evaluates the complex k-point determinant expansion entirely
in (re, im) real-pair arithmetic, and exposes the phase channels that
stochastic reconfiguration needs for COMPLEX local energies:

  * pgradient_pair       -> (d log|Psi|/dp, d arg Psi/dp)
  * gradient_laplacian_pair -> Im parts of grad/lap (E_I channel)
  * testvalue_pair       -> signed/phased ratios for the ECP projection

so the SR gradient g = 2[<E_R R> - E<R> + <E_I I>] is exact at a general
twist (see observables/sr.py docstring for the derivation).
"""

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from fixtures_pbc import load_cell

from pyqmc_tpu.system.supercell import get_supercell
from pyqmc_tpu.models.orbitals import KPointOrbitals
from pyqmc_tpu.models.slater import DeterminantExpansion
from pyqmc_tpu.models.slater_pair import PairKSlater
from pyqmc_tpu.configs import initial_guess
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.observables.transform import LinearTransform
from pyqmc_tpu.method.linemin import line_minimization
from pyqmc_tpu.method.vmc import vmc

cell, d = load_cell("li_cubic_ccecp")
sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
# shift the k-mesh by an arbitrary twist: NOT time-reversal invariant, so
# the wavefunction is irreducibly complex
kpts = np.asarray(d["kpts"]) + np.array([0.027, -0.011, 0.019])
blocks = [np.asarray(d["mo_coeff"][k])[:, :2] for k in range(8)]
orb = KPointOrbitals(cell, kpts, (blocks, blocks), realify=False)

# ground determinant + one up and one dn excitation
ground = np.arange(0, 16, 2)
exc = ground.copy(); exc[0] = 1
expn = DeterminantExpansion(
    np.stack([ground, exc]), np.stack([ground, exc]),
    np.array([0, 1, 0]), np.array([0, 0, 1]),
)
wf = PairKSlater(sup, orb, expn, det_coeff=np.array([0.8, 0.4, 0.4]))
params = wf.make_params()

# optimize the determinant coefficients and one orbital block
to_opt = {k: (k in ("det_coeff", "mo_coeff_alpha_re", "mo_coeff_alpha_im"))
          for k in params}
lt = LinearTransform(params, to_opt)
print("optimizing", lt.nparams, "parameters")

acc = EnergyAccumulator(sup)
cfg = initial_guess(sup, 400, key=jax.random.PRNGKey(10))
_, cfg = vmc(wf, params, cfg, nblocks=4, nsteps_per_block=10, tstep=1.0,
             key=jax.random.PRNGKey(11))
popt, cfg, recs = line_minimization(
    wf, params, cfg, lt, acc, key=jax.random.PRNGKey(12),
    max_iterations=10, vmc_blocks=6, vmc_tstep=1.0, verbose=True,
)
print("energies:", [round(r["energy"], 5) for r in recs])
print("optimized det_coeff:", np.asarray(popt["det_coeff"]))
