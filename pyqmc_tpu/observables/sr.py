"""Stochastic reconfiguration accumulator + update rule.

Port of pyqmc/observables/stochastic_reconfiguration.py:48-177. Per-step
walker averages of (E, dp, E dp, dp_i dp_j) are accumulated inside the jitted
VMC block (outer-product einsum fuses on the MXU and is psum-reduced under
shard_map); the small (nparam, nparam) solve happens on the host.

Two reference capabilities are folded in:

* Nodal regularization (Pathak & Wagner 2020, reference
  stochastic_reconfiguration.py:21-45): parameter-gradient terms are damped
  by f(r) = 9(r/c)^2 - 15(r/c)^4 + 7(r/c)^6 (r = |grad lnPsi|^-1) within
  r < nodal_cutoff of a node, bounding the otherwise fat-tailed gradient
  variance of all-electron optimizations. As in the reference, dpH and
  dppsi use the regularized gradients while dpidpj pairs one regularized
  with one raw factor.

* Complex parameters / complex local energy (general-twist k-points,
  reference accumulators.py:122-185 + test_complex_linemin.py): gradients
  arrive as a REAL (R, I) pair from LinearTransform.serialize_gradients_pair,
  so the whole accumulation runs in real arithmetic (the TPU backend has no
  complex ops). With O_k = dlnPsi/dtheta_k = R_k + i I_k and local energy
  E_L = E_R + i E_I:
      g_k    = 2 [ <E_R R_k> - <E_R><R_k> + <E_I I_k> - <E_I><I_k> ]
      S_kl   = <R_k R_l + I_k I_l> - <R_k><R_l> - <I_k><I_l>
  (the conjugated metric Re<O_k* O_l> - Re(<O_k>*<O_l>)). The +<E_I I_k>
  sign follows from hermiticity: <d_theta E_L> = -2i <O E_I>, so
  dE/dtheta = 2<E_I I_theta> + 2<(E_R - E) R_theta> — verified analytically
  on Psi = phi(x) exp(i theta g(x)) where dE/dtheta = theta <g'^2> exactly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .transform import LinearTransform


def nodal_regularization(grad2, nodal_cutoff=1e-3):
    """Damping factor per walker (1 away from nodes, ->0 at a node).

    grad2 = sum_e |grad_e lnPsi|^2; r = 1/grad2 ~ (distance to node)^2.
    jit-safe branchless form of the reference's mask+polynomial
    (stochastic_reconfiguration.py:21-45).
    """
    r = 1.0 / jnp.maximum(grad2, 1e-30)
    c2 = nodal_cutoff**2
    x = r / c2
    f = 9.0 * x - 15.0 * x**2 + 7.0 * x**3
    return jnp.where(r < c2, f, 1.0)


class StochasticReconfiguration:
    def __init__(self, energy_acc, transform: LinearTransform, wf=None,
                 eps: float = 1e-3, nodal_cutoff: float = 1e-3):
        self.energy_acc = energy_acc
        self.transform = transform
        self.eps = eps
        self.nodal_cutoff = nodal_cutoff

    def __call__(self, wf, params, state, positions, key=None):
        d = self.energy_acc(
            wf, params, state, positions, key=key, with_imag=True
        )
        if getattr(wf, "ratio_is_modulus", False) and hasattr(
            wf, "pgradient_pair"
        ):
            # real-backend twist path: params are real (re/im split) but
            # O = dlnPsi/dp is complex; the phase channel arrives as a
            # separate real tree (models/slater_pair.pgradient_pair)
            pre, pim = wf.pgradient_pair(params, positions)
            R = self.transform.serialize_batch(pre)
            I = self.transform.serialize_batch(pim)
        else:
            pgrad = wf.pgradient(params, positions)
            R, I = self.transform.serialize_gradients_pair(pgrad)
        return {
            "total": d["total"], "total_im": d["total_im"],
            "grad2": d["grad2"], "dpR": R, "dpI": I,
        }

    def avg(self, wf, params, state, positions, key=None):
        dat = self(wf, params, state, positions, key=key)
        eR, R, I = dat["total"], dat["dpR"], dat["dpI"]
        nconf = R.shape[0]
        f = nodal_regularization(dat["grad2"], self.nodal_cutoff)
        Rreg = R * f[:, None]
        out = {
            "total": jnp.mean(eR),
            "dp": jnp.mean(Rreg, axis=0),
            "dpH": jnp.einsum("c,cp->p", eR, Rreg) / nconf,
            "dpidpj": jnp.einsum("ci,cj->ij", R, Rreg) / nconf,
        }
        if I is not None:
            eI = dat["total_im"]
            Ireg = I * f[:, None]
            out["total_im"] = jnp.mean(eI)
            out["dpI"] = jnp.mean(Ireg, axis=0)
            out["dpHI"] = jnp.einsum("c,cp->p", eI, Ireg) / nconf
            out["dpidpjI"] = jnp.einsum("ci,cj->ij", I, Ireg) / nconf
        return out

    def keys(self):
        return {"total", "dp", "dpH", "dpidpj", "dpI", "dpHI", "dpidpjI"}

    # --- host-side update (stochastic_reconfiguration.py:138-176) ---------
    def delta_p(self, taus, block_avg):
        """Returns list of parameter steps -tau * Sinv g for each tau."""
        en = np.mean(np.asarray(block_avg["total"]))
        dp = np.mean(np.asarray(block_avg["dp"]), axis=0)
        dpH = np.mean(np.asarray(block_avg["dpH"]), axis=0)
        dpidpj = np.mean(np.asarray(block_avg["dpidpj"]), axis=0)
        g = 2.0 * (dpH - en * dp)
        S = dpidpj - np.outer(dp, dp)
        if "dpI" in block_avg:
            enI = np.mean(np.asarray(block_avg["total_im"]))
            dpI = np.mean(np.asarray(block_avg["dpI"]), axis=0)
            dpHI = np.mean(np.asarray(block_avg["dpHI"]), axis=0)
            dpidpjI = np.mean(np.asarray(block_avg["dpidpjI"]), axis=0)
            g = g + 2.0 * (dpHI - enI * dpI)
            S = S + dpidpjI - np.outer(dpI, dpI)
        Sreg = S + self.eps * np.eye(len(dp))
        step = np.linalg.solve(Sreg, g)
        return [-tau * step for tau in taus], float(np.linalg.norm(g))
