"""Three-body (electron-electron-ion) Jastrow.

TPU-first redesign of pyqmc/wf/three_body_jastrow.py:19-719:

    U = sum_{I, i<j, klm} C[I,k,l,m,ch(i,j)] a_k(r_iI) a_l(r_jI) b_m(r_ij)

The reference maintains per-electron partial sums for O(N) updates
(three_body_jastrow.py:66-189); here the state is just (positions, U) and a
one-electron move recomputes only the terms touching that electron as dense
einsums — static shapes, fused on the VPU/MXU.

C is stored symmetrized in (k,l) (the reference symmetrizes too,
three_body_jastrow.py:94-96); electron ordering [up, down], channels
ch = s_i + s_j in {0,1,2}.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import Geometry
from . import func3d


class Jastrow3State(NamedTuple):
    positions: jax.Array
    u: jax.Array


class ThreeBodyJastrow:
    def __init__(self, mol, a_basis=None, b_basis=None, geometry: Geometry = None):
        self.nup, self.ndn = mol.nelec
        self.nelec = self.nup + self.ndn
        self.atom_coords = np.asarray(mol.atom_coords)
        self.natom = len(self.atom_coords)
        self.a_basis = tuple(a_basis or func3d.default_ei_basis(3))
        self.b_basis = tuple(b_basis or func3d.default_ei_basis(3))
        self.geometry = geometry or Geometry(getattr(mol, "lattice", None))
        # cutoff-bounded bases: rounding minimal image is exact for
        # max rcut <= half min interplanar spacing (see JastrowSpin)
        rcut_max = max(b.rcut for b in self.a_basis + self.b_basis)
        self._mi = self.geometry.minimal_image_for(rcut_max)
        self._spin = np.concatenate(
            [np.zeros(self.nup, dtype=np.int32), np.ones(self.ndn, dtype=np.int32)]
        )

    def make_params(self):
        na, nb = len(self.a_basis), len(self.b_basis)
        return {"ccoeff": jnp.zeros((self.natom, na, na, nb, 3))}

    def _sym(self, c):
        return 0.5 * (c + jnp.swapaxes(c, 1, 2))

    def _basis_ei(self, positions, derivs=False):
        d = positions[..., None, :] - jnp.asarray(
            self.atom_coords, positions.dtype
        )
        d = self._mi(d)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        if derivs:
            return d, func3d.eval_basis_all(self.a_basis, r)
        return d, func3d.eval_basis_value(self.a_basis, r)

    def _u_total(self, params, positions):
        c = self._sym(params["ccoeff"])  # (I, k, l, m, 3)
        _, a = self._basis_ei(positions)  # (c, n, I, k)
        d_ee = positions[:, None, :, :] - positions[:, :, None, :]
        d_ee = self._mi(d_ee)
        r_ee = jnp.sqrt(jnp.sum(d_ee * d_ee, axis=-1) + 1e-300)
        b = func3d.eval_basis_value(self.b_basis, r_ee)  # (c, i, j, m)
        spin = jnp.asarray(self._spin)
        chan = spin[:, None] + spin[None, :]  # (n, n)
        notsame = 1.0 - jnp.eye(self.nelec, dtype=positions.dtype)
        csel = c[:, :, :, :, chan]  # (I, k, l, m, i, j)
        u = 0.5 * jnp.einsum(
            "ciIk,cjIl,cijm,Iklmij,ij->c", a, a, b, csel, notsame,
            optimize=True,
        )
        return u

    def _e_terms(self, params, positions, e, epos, want_derivs):
        """Terms containing electron e at position(s) epos."""
        c = self._sym(params["ccoeff"])
        aux = epos.ndim == 3
        ep = epos if aux else epos[:, None, :]
        dtype = ep.dtype
        # e-ion basis at epos
        d_eI = ep[:, :, None, :] - jnp.asarray(self.atom_coords, dtype)[None, None]
        d_eI = self._mi(d_eI)
        r_eI = jnp.sqrt(jnp.sum(d_eI * d_eI, axis=-1))  # (c, A, I)
        # other electrons' e-ion basis (fixed)
        _, a_j = self._basis_ei(positions)  # (c, n, I, l)
        # e-e to others
        d_ej = ep[:, :, None, :] - positions[:, None, :, :]
        d_ej = self._mi(d_ej)
        r_ej = jnp.sqrt(jnp.sum(d_ej * d_ej, axis=-1) + 1e-300)  # (c, A, n)
        spin = jnp.asarray(self._spin)
        spin_e = (e >= self.nup).astype(jnp.int32)
        chan = spin_e + spin  # (n,)
        notself = (jnp.arange(self.nelec) != e).astype(dtype)
        csel = c[:, :, :, :, chan]  # (I, k, l, m, n)

        if not want_derivs:
            a_e = func3d.eval_basis_value(self.a_basis, r_eI)  # (c, A, I, k)
            b_e = func3d.eval_basis_value(self.b_basis, r_ej)  # (c, A, n, m)
            u = jnp.einsum(
                "caIk,cjIl,cajm,Iklmj,j->ca", a_e, a_j, b_e, csel, notself,
                optimize=True,
            )
            return u if aux else u[:, 0]

        a_v, a_fr, a_lp = func3d.eval_basis_all(self.a_basis, r_eI)
        b_v, b_fr, b_lp = func3d.eval_basis_all(self.b_basis, r_ej)
        u = jnp.einsum(
            "caIk,cjIl,cajm,Iklmj,j->ca", a_v, a_j, b_v, csel, notself,
            optimize=True,
        )
        # gradient: (a_fr d_eI) a_j b + a a_j (b_fr d_ej)
        g = jnp.einsum(
            "caIk,cjIl,cajm,Iklmj,j,caIx->cax",
            a_fr, a_j, b_v, csel, notself, d_eI, optimize=True,
        ) + jnp.einsum(
            "caIk,cjIl,cajm,Iklmj,j,cajx->cax",
            a_v, a_j, b_fr, csel, notself, d_ej, optimize=True,
        )
        # laplacian: lap_a * a_j * b + a * a_j * lap_b + 2 grad_a . grad_b
        dot = jnp.einsum("caIx,cajx->caIj", d_eI, d_ej)
        lap = (
            jnp.einsum(
                "caIk,cjIl,cajm,Iklmj,j->ca",
                a_lp, a_j, b_v, csel, notself, optimize=True,
            )
            + jnp.einsum(
                "caIk,cjIl,cajm,Iklmj,j->ca",
                a_v, a_j, b_lp, csel, notself, optimize=True,
            )
            + 2.0
            * jnp.einsum(
                "caIk,cjIl,cajm,Iklmj,j,caIj->ca",
                a_fr, a_j, b_fr, csel, notself, dot, optimize=True,
            )
        )
        if aux:
            return u, g, lap
        return u[:, 0], g[:, 0], lap[:, 0]

    # --- protocol ----------------------------------------------------------
    def recompute(self, params, positions):
        return Jastrow3State(positions=positions, u=self._u_total(params, positions))

    def value(self, params, state):
        return jnp.ones_like(state.u), state.u

    def testvalue(self, params, state, e, epos):
        u_new = self._e_terms(params, state.positions, e, epos, False)
        u_old = self._e_terms(
            params, state.positions, e, state.positions[:, e, :], False
        )
        du = u_new - (u_old[:, None] if u_new.ndim == 2 else u_old)
        return jnp.exp(du), {"du": du}

    def testvalue_many(self, params, state, epos):
        """exp(dU_e) for each electron moved to epos; (nconf, nelec)."""
        positions = state.positions
        c = self._sym(params["ccoeff"])
        dtype = positions.dtype
        spin = jnp.asarray(self._spin)
        # shared pieces at epos
        d_eI = epos[:, None, :] - jnp.asarray(self.atom_coords, dtype)[None]
        d_eI = self._mi(d_eI)
        r_eI = jnp.sqrt(jnp.sum(d_eI * d_eI, axis=-1))
        a_e = func3d.eval_basis_value(self.a_basis, r_eI)  # (c, I, k)
        _, a_j = self._basis_ei(positions)  # (c, n, I, l)
        d_ej = epos[:, None, :] - positions
        d_ej = self._mi(d_ej)
        r_ej = jnp.sqrt(jnp.sum(d_ej * d_ej, axis=-1) + 1e-300)
        b_e = func3d.eval_basis_value(self.b_basis, r_ej)  # (c, n, m)
        # U_s = sum_j c[..., s + spin_j] a_e a_j b_e for s = 0, 1
        cs = c[:, :, :, :, spin[None, :] + jnp.asarray([[0], [1]])]  # (I,k,l,m,2,n)
        U = jnp.einsum("cIk,cjIl,cjm,Iklmsj->cs", a_e, a_j, b_e, cs,
                       optimize=True)
        # self term j = e (channel 2 spin_e)
        c_self = c[:, :, :, :, 2 * spin]  # (I, k, l, m, n)
        sub = jnp.einsum("cIk,ceIl,cem,Iklme->ce", a_e, a_j, b_e, c_self,
                         optimize=True)
        u_new = U[:, spin] - sub
        # old per-electron partials P_e at current positions
        d_full = positions[:, None, :, :] - positions[:, :, None, :]
        d_full = self._mi(d_full)
        r_full = jnp.sqrt(jnp.sum(d_full * d_full, axis=-1) + 1e-300)
        b_full = func3d.eval_basis_value(self.b_basis, r_full)
        chan = spin[:, None] + spin[None, :]
        cfull = c[:, :, :, :, chan]  # (I,k,l,m,i,j)
        mask = 1.0 - jnp.eye(self.nelec, dtype=dtype)
        u_old = jnp.einsum(
            "ciIk,cjIl,cijm,Iklmij,ij->ci", a_j, a_j, b_full, cfull, mask,
            optimize=True,
        )
        return jnp.exp(u_new - u_old)

    def gradient_value(self, params, state, e, epos):
        u_new, g, _ = self._e_terms(params, state.positions, e, epos, True)
        u_old = self._e_terms(
            params, state.positions, e, state.positions[:, e, :], False
        )
        return g, jnp.exp(u_new - u_old), {"du": u_new - u_old}

    def gradient(self, params, state, e, epos):
        _, g, _ = self._e_terms(params, state.positions, e, epos, True)
        return g

    def gradient_value_pair(self, params, state, e, epos_old, epos_new):
        X = jnp.stack([epos_old, epos_new], axis=1)
        u, g, _ = self._e_terms(params, state.positions, e, X, True)
        du = u[:, 1] - u[:, 0]
        return g[:, 0], g[:, 1], jnp.exp(du), {"du": du}

    def move_begin(self, params, state, e, epos):
        """Move protocol (see models/jastrow.py): one old-position pass
        supplies drift gradient AND u_old for move_finish's ratio."""
        u_old, g, _ = self._e_terms(params, state.positions, e, epos, True)
        return g, u_old

    def move_finish(self, params, state, e, epos, aux):
        u_new, g, _ = self._e_terms(params, state.positions, e, epos, True)
        du = u_new - aux
        return g, jnp.exp(du), {"du": du}

    def gradient_laplacian(self, params, state, e, epos):
        _, g, lap = self._e_terms(params, state.positions, e, epos, True)
        return g, lap + jnp.sum(g * g, axis=-1)

    def updateinternals(self, params, state, e, epos, mask, saved):
        m = mask[:, None]
        newpos = state.positions.at[:, e, :].set(
            jnp.where(m, epos, state.positions[:, e, :])
        )
        newu = jnp.where(mask, state.u + saved["du"], state.u)
        return Jastrow3State(positions=newpos, u=newu)

    def pgradient(self, params, positions):
        def single(pos):
            return jax.grad(lambda p: self._u_total(p, pos[None])[0])(params)

        return jax.vmap(single)(positions)
