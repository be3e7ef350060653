"""Generic exp(U) pair Jastrow with O(1)-per-move cached updates, plus the
two concrete instances the reference ships:

  * GeminalJastrow (pyqmc/wf/geminaljastrow.py:21-100):
        U = sum_{i<j} sum_{mn} g_mn chi_m(r_i) chi_n(r_j),  g symmetric
  * GPSJastrow (pyqmc/wf/gps2.py:4-139):
        U = sum_{i<j} sum_s alpha_s (k0_i k1_j + k1_i k0_j),
        k0_i = exp(-f |r_i - X_s0|^2)   (learnable alpha, f, X).

Both are bilinear pair forms

    U = sum_{i<j} phi(r_i)^T A phi(r_j)
      = 0.5 * ( S^T A S - sum_i phi_i^T A phi_i ),   S = sum_i phi(r_i),

so the wavefunction state caches the per-electron feature rows phi_i and
their sum S, and a one-electron move costs O(F) independent of nelec:

    dU(e -> r') = (phi(r') - phi_e)^T A (S - phi_e).

This is the TPU analogue of the reference GPS Jastrow's per-move kernel
cache (pyqmc/wf/gps2.py:68-74) generalized to any bilinear pair kernel;
derivatives come from autodiff through the single-point feature map only
(gradient) and a 3-term forward-over-reverse Hessian diagonal (laplacian).
Subclasses provide `features` and `bilinear` (A is never materialized when
it is structured, as in GPS).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.gto import GTOSpec, eval_gto


class GenericJastrowState(NamedTuple):
    positions: jax.Array
    u: jax.Array
    phi: jax.Array  # (nconf, nelec, F) per-electron feature rows
    ssum: jax.Array  # (nconf, F) sum of feature rows


class GenericJastrow:
    """exp(U) wavefunction for U = sum_{i<j} phi(r_i)^T A phi(r_j).

    Subclasses define `features(params, xyz)` mapping (..., 3) -> (..., F)
    and `bilinear(params, u, v)` computing u^T A v over the last axis with
    broadcasting (A symmetric).
    """

    def __init__(self, nelec):
        self.nelec = nelec

    def features(self, params, xyz):  # (..., 3) -> (..., F)
        raise NotImplementedError

    def bilinear(self, params, u, v):  # (..., F),(..., F) -> (...)
        raise NotImplementedError

    def make_params(self):
        raise NotImplementedError

    def u_total(self, params, positions):  # (nconf, nelec, 3) -> (nconf,)
        phi = self.features(params, positions)
        s = jnp.sum(phi, axis=1)
        diag = jnp.sum(self.bilinear(params, phi, phi), axis=1)
        return 0.5 * (self.bilinear(params, s, s) - diag)

    # --- protocol ----------------------------------------------------------
    def recompute(self, params, positions):
        phi = self.features(params, positions)
        s = jnp.sum(phi, axis=1)
        diag = jnp.sum(self.bilinear(params, phi, phi), axis=1)
        u = 0.5 * (self.bilinear(params, s, s) - diag)
        return GenericJastrowState(positions, u, phi, s)

    def value(self, params, state):
        return jnp.ones_like(state.u), state.u

    def _rest(self, params, state, e):
        """phi_e and S - phi_e for (traced) electron e."""
        phi_e = jnp.take(state.phi, e, axis=1)  # (c, F)
        return phi_e, state.ssum - phi_e

    def testvalue(self, params, state, e, epos):
        phi_e, rest = self._rest(params, state, e)
        eph = self.features(params, epos)
        if epos.ndim == 3:  # aux-point axis: (c, naip, 3)
            du = self.bilinear(
                params, eph - phi_e[:, None, :], rest[:, None, :]
            )
        else:
            du = self.bilinear(params, eph - phi_e, rest)
        return jnp.exp(du), {"du": du, "phi": eph}

    def testvalue_many(self, params, state, epos):
        cols = []
        for e in range(self.nelec):
            r, _ = self.testvalue(params, state, jnp.int32(e), epos)
            cols.append(r)
        return jnp.stack(cols, axis=1)

    def _du_fn(self, params, state, e):
        phi_e, rest = self._rest(params, state, e)

        def du_of(ep):  # (c, 3) -> (c,)
            return self.bilinear(params, self.features(params, ep) - phi_e, rest)

        return du_of

    def gradient(self, params, state, e, epos):
        du_of = self._du_fn(params, state, e)
        return jax.grad(lambda ep: jnp.sum(du_of(ep)))(epos)

    def gradient_value(self, params, state, e, epos):
        du_of = self._du_fn(params, state, e)
        du = du_of(epos)
        g = jax.grad(lambda ep: jnp.sum(du_of(ep)))(epos)
        return g, jnp.exp(du), {"du": du, "phi": self.features(params, epos)}

    def gradient_laplacian(self, params, state, e, epos):
        du_of = self._du_fn(params, state, e)
        g = jax.grad(lambda ep: jnp.sum(du_of(ep)))(epos)

        # laplacian of U via 3 forward-over-reverse Hessian diagonal terms
        def du_axis(ax):
            def gax(ep):
                return jax.grad(lambda p: jnp.sum(du_of(p)))(ep)[:, ax]

            _, hvp = jax.jvp(
                gax, (epos,), (jnp.zeros_like(epos).at[:, ax].set(1.0),)
            )
            return hvp

        lap_u = du_axis(0) + du_axis(1) + du_axis(2)
        return g, lap_u + jnp.sum(g * g, axis=-1)

    def updateinternals(self, params, state, e, epos, mask, saved):
        m = mask[:, None]
        phi_e = jnp.take(state.phi, e, axis=1)
        new_e = jnp.where(m, saved["phi"], phi_e)
        newpos = state.positions.at[:, e, :].set(
            jnp.where(m, epos, state.positions[:, e, :])
        )
        return GenericJastrowState(
            newpos,
            jnp.where(mask, state.u + saved["du"], state.u),
            state.phi.at[:, e, :].set(new_e),
            state.ssum + (new_e - phi_e),
        )

    def pgradient(self, params, positions):
        def single(pos):
            return jax.grad(lambda p: self.u_total(p, pos[None])[0])(params)

        return jax.vmap(single)(positions)


def _gamma_replicated_spec(cell, tol=1e-6, ngrid=6):
    """Gamma-point supercell AO table for a periodic cell.

    chi_mu(r) = sum_L chi_mu(r - R_mu - L) over the lattice images whose
    basis functions reach the home cell, realized as a culled
    replicated-shell GTOSpec (one shell per kept (shell, image) pair, the
    construction KPointOrbitals uses for its real-mode fast path,
    models/orbitals.py:201-251) plus a 0/1 image-sum matrix P
    (nao_repl, nao). The reference builds the same gamma-point supercell
    AOs for GeminalJastrow on cells (pyqmc/wf/geminaljastrow.py:52-55,
    259-283) through pyscf's eval_gto.
    """
    import dataclasses as _dc

    from .orbitals import select_pbc_images

    lat = np.asarray(cell.lattice, dtype=np.float64)
    images = select_pbc_images(lat, cell.shells, cell.atom_coords, tol)
    fr = (np.arange(ngrid) + 0.5) / ngrid
    grid = (
        np.array(np.meshgrid(fr, fr, fr, indexing="ij")).reshape(3, -1).T @ lat
    )
    margin = 0.5 * np.linalg.norm(lat.sum(axis=0)) / ngrid
    centers, repl, rows = [], [], []
    off = 0
    for L in images:
        for sh in cell.shells:
            c = cell.atom_coords[sh.atom] + L
            rcut = np.sqrt(-np.log(tol) / float(np.min(sh.exps)))
            if np.min(np.linalg.norm(grid - c[None], axis=1)) > rcut + margin:
                continue
            repl.append(_dc.replace(sh, atom=len(centers), ao_offset=off))
            centers.append(c)
            rows.append(sh)
            off += 2 * sh.l + 1
    spec = GTOSpec.from_shells(repl, np.asarray(centers), off)
    P = np.zeros((off, cell.nao))
    row = 0
    for sh in rows:
        n = 2 * sh.l + 1
        P[row : row + n, sh.ao_offset : sh.ao_offset + n] = np.eye(n)
        row += n
    return spec, P


class GeminalJastrow(GenericJastrow):
    """AO-pair geminal Jastrow; on a Cell the feature map is the
    gamma-point supercell AO sum (periodic and smooth across the cell
    boundary), matching pyqmc/wf/geminaljastrow.py:21-66,259-283."""

    def __init__(self, mol, img_tol=1e-6):
        super().__init__(sum(mol.nelec))
        self.nao = mol.nao
        lattice = getattr(mol, "lattice", None)
        if lattice is None:
            self.spec = GTOSpec.from_molecule(mol)
            self._P = None
        else:
            self.spec, P = _gamma_replicated_spec(mol, img_tol)
            self._P = P
            self._lattice = np.asarray(lattice, dtype=np.float64)
            self._lattice_inv = np.linalg.inv(self._lattice)

    def make_params(self):
        return {"gcoeff": jnp.zeros((self.nao, self.nao))}

    def features(self, params, xyz):
        lead = xyz.shape[:-1]
        X = xyz.reshape(-1, 3)
        if self._P is not None:
            # fold into the home cell (floor has zero derivative, so
            # autodiff gradients/laplacians pass through unchanged)
            frac = X @ jnp.asarray(self._lattice_inv, X.dtype)
            X = (frac - jnp.floor(frac)) @ jnp.asarray(self._lattice, X.dtype)
        chi = eval_gto(self.spec, X, 0)
        if self._P is not None:
            chi = chi @ jnp.asarray(self._P, chi.dtype)
        return chi.reshape(*lead, self.nao)

    def bilinear(self, params, u, v):
        g = 0.5 * (params["gcoeff"] + params["gcoeff"].T)
        return jnp.einsum("...m,mn,...n->...", u, g, v)


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

    def features(self, params, xyz):
        X = params["Xsupport"]  # (s, 2, 3)
        d = xyz[..., None, None, :] - X  # (..., s, 2, 3)
        k = jnp.exp(-params["f"] * jnp.sum(d * d, axis=-1))  # (..., s, 2)
        return k.reshape(*xyz.shape[:-1], 2 * self.n_support)

    def bilinear(self, params, u, v):
        s = self.n_support
        u = u.reshape(*u.shape[:-1], s, 2)
        v = v.reshape(*v.shape[:-1], s, 2)
        # pair kernel k0_i k1_j + k1_i k0_j, weighted by alpha
        cross = u[..., 0] * v[..., 1] + u[..., 1] * v[..., 0]
        return jnp.einsum("...s,s->...", cross, params["alpha"])
