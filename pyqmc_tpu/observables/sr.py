"""Stochastic reconfiguration accumulator + update rule.

Port of pyqmc/observables/stochastic_reconfiguration.py:48-177. Per-step
walker averages of (E, dp, E dp, dp_i dp_j) are accumulated inside the jitted
VMC block (outer-product einsum fuses on the MXU and is psum-reduced under
shard_map); the small (nparam, nparam) solve happens on the host.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .transform import LinearTransform


class StochasticReconfiguration:
    def __init__(self, energy_acc, transform: LinearTransform, wf=None,
                 eps: float = 1e-3):
        self.energy_acc = energy_acc
        self.transform = transform
        self.eps = eps

    def __call__(self, wf, params, state, positions, key=None):
        en = self.energy_acc(wf, params, state, positions, key=key)["total"]
        pgrad = wf.pgradient(params, positions)
        dp = jnp.real(self.transform.serialize_batch(pgrad))  # (nconf, np)
        return {"total": en, "dp": dp}

    def avg(self, wf, params, state, positions, key=None):
        dat = self(wf, params, state, positions, key=key)
        en, dp = dat["total"], dat["dp"]
        nconf = dp.shape[0]
        return {
            "total": jnp.mean(en),
            "dp": jnp.mean(dp, axis=0),
            "dpH": jnp.einsum("c,cp->p", en, dp) / nconf,
            "dpidpj": jnp.einsum("ci,cj->ij", dp, dp) / nconf,
        }

    def keys(self):
        return {"total", "dp", "dpH", "dpidpj"}

    # --- host-side update (stochastic_reconfiguration.py:138-176) ---------
    def delta_p(self, taus, block_avg):
        """Returns list of parameter steps -tau * Sinv g for each tau."""
        en = np.mean(np.asarray(block_avg["total"]))
        dp = np.mean(np.asarray(block_avg["dp"]), axis=0)
        dpH = np.mean(np.asarray(block_avg["dpH"]), axis=0)
        dpidpj = np.mean(np.asarray(block_avg["dpidpj"]), axis=0)
        g = 2.0 * (dpH - en * dp)
        S = dpidpj - np.outer(dp, dp)
        Sreg = S + self.eps * np.eye(len(dp))
        step = np.linalg.solve(Sreg, g)
        return [-tau * step for tau in taus], float(np.linalg.norm(g))
