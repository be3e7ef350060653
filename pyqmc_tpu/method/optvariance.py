"""Variance optimization (port of pyqmc/method/optvariance.py:20-70):
derivative-free scipy minimization of Var(E_L) over fixed configurations."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.optimize


def optvariance(energy_acc, wf, params, configs, transform, key=None, **kwargs):
    """Returns (opt_variance, params)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    positions = configs.positions

    @jax.jit
    def eloc(p):
        state = wf.recompute(p, positions)
        return energy_acc(wf, p, state, positions, key=key)["total"]

    x0 = np.asarray(transform.serialize(params))

    def cost(x):
        p = transform.deserialize(params, jnp.asarray(x))
        e = np.asarray(eloc(p))
        if not np.all(np.isfinite(e)):
            return 1e6
        return float(np.var(e))

    res = scipy.optimize.minimize(
        cost, x0, method=kwargs.pop("method", "Powell"), **kwargs
    )
    return res.fun, transform.deserialize(params, jnp.asarray(res.x))
