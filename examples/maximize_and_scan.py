"""Wavefunction maximization + conditional scan (parity with the reference's
examples/visualization/04_maximize_and_plot.py and conditional_wf.py):

  1. find the |Psi|-maximizing electron configuration with scipy BFGS over
     recompute + gradient,
  2. scan psi(r_e | others fixed) for one electron over a grid via
     testvalue with the aux axis (one batched call).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize

from pyqmc_tpu.api import (
    Molecule, run_scf, Slater, JastrowSpin, MultiplyWF, initial_guess,
)

# host-side analysis task: run on CPU in double precision (TPU's LU is
# f32-only, and a BFGS line search wants f64 gradients)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

mol = Molecule("H 0 0 0; H 0 0 1.4", basis="ccpvdz")
mf = run_scf(mol)
wf = MultiplyWF(Slater.from_mean_field(mf), JastrowSpin(mol))
params = wf.make_params()
nelec = sum(mol.nelec)


@jax.jit
def neg_logabs_and_grad(flat):
    pos = flat.reshape(1, nelec, 3)
    state = wf.recompute(params, pos)
    _, la = wf.value(params, state)

    def f(fl):
        st = wf.recompute(params, fl.reshape(1, nelec, 3))
        return -wf.value(params, st)[1][0]

    return -la[0], jax.grad(f)(flat)


x0 = np.asarray(initial_guess(mol, 1, key=jax.random.PRNGKey(0)).positions).ravel()
res = scipy.optimize.minimize(
    lambda x: [np.asarray(v) for v in neg_logabs_and_grad(jnp.asarray(x))],
    x0, jac=True, method="BFGS",
)
rmax = res.x.reshape(nelec, 3)
print("maximum |Psi| configuration:\n", np.round(rmax, 4))

# conditional scan of electron 0 along the bond axis
state = wf.recompute(params, jnp.asarray(rmax[None]))
zs = np.linspace(-3, 4.5, 120)
grid = np.zeros((1, len(zs), 3))
grid[0, :, 2] = zs
ratios, _ = wf.testvalue(params, state, jnp.int32(0), jnp.asarray(grid))
print("conditional |psi(z)/psi| along bond:")
vals = np.abs(np.asarray(ratios[0]))
peak = zs[np.argmax(vals)]
print(f"  peak at z = {peak:.3f} bohr (protons at 0 and 1.4)")
