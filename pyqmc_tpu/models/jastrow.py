"""Two-body (electron-ion + electron-electron) spin-dependent Jastrow.

TPU-first redesign of pyqmc/wf/jastrowspin.py. The reference maintains
_avalues/_bvalues plus per-electron partial-sum caches for O(N) one-electron
updates (jastrowspin.py:56-137,221-249). Here the state carries only the
electron positions and the scalar U: a one-electron testvalue touches just
the pair terms involving that electron (O(N*nbasis) dense work), which on TPU
is a handful of fused VPU ops — no cache bookkeeping, no cache staleness.

    U = sum_{i,I,k} acoeff[I,k,s_i] a_k(r_iI)
      + sum_{i<j,k} bcoeff[k, ch(i,j)] b_k(r_ij)     (jastrowspin.py:20-29)

channels ch: 0=up-up, 1=up-down, 2=down-down. Electron ordering is
[0..nup) up, [nup..nelec) down. Periodic systems use minimal-image distances
carried by the static Geometry.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import Geometry
from . import func3d


class JastrowState(NamedTuple):
    positions: jax.Array  # (nconf, nelec, 3)
    u: jax.Array  # (nconf,)


class JastrowSpin:
    def __init__(self, mol, a_basis=None, b_basis=None, geometry: Geometry = None):
        self.nup, self.ndn = mol.nelec
        self.nelec = self.nup + self.ndn
        self.atom_coords = np.asarray(mol.atom_coords)
        self.natom = len(self.atom_coords)
        self.a_basis = tuple(a_basis or func3d.default_ei_basis())
        self.b_basis = tuple(b_basis or func3d.default_ee_basis())
        self.geometry = geometry or Geometry(getattr(mol, "lattice", None))
        # every basis is cutoff-bounded, so the cheap rounding minimal image
        # is exact whenever max rcut <= half the min interplanar spacing
        # (Geometry.minimal_image_for) — replaces the 27-image search that
        # dominated periodic SJ-VMC blocks
        rcut_max = max(b.rcut for b in self.a_basis + self.b_basis)
        self._mi = self.geometry.minimal_image_for(rcut_max)
        self._spin = np.concatenate(
            [np.zeros(self.nup, dtype=np.int32), np.ones(self.ndn, dtype=np.int32)]
        )

    def make_params(self, ion_cusp=()):
        """acoeff (natom, na, 2), bcoeff (nb, 3).

        The e-e cusp condition is imposed through the first b basis function
        (cutoffcusp with f'(0)=1): coefficients (0.25, 0.5, 0.25) for
        (uu, ud, dd) (wftools.py:99-152 semantics). If ion_cusp lists atom
        indices, the a cusp term would be added there (needs a cutoffcusp
        leading a_basis; not enabled by default since ECP atoms are smooth).
        """
        na, nb = len(self.a_basis), len(self.b_basis)
        acoeff = jnp.zeros((self.natom, na, 2))
        bcoeff = jnp.zeros((nb, 3))
        if self.b_basis[0].kind == "cutoffcusp":
            bcoeff = bcoeff.at[0].set(jnp.asarray([0.25, 0.5, 0.25]))
        return {"acoeff": acoeff, "bcoeff": bcoeff}

    # --- internals --------------------------------------------------------
    def _dists(self, d):
        """Norm with minimal image applied; d (..., 3) displacement."""
        dmi = self._mi(d)
        return dmi, jnp.sqrt(jnp.sum(dmi * dmi, axis=-1))

    def _u_total(self, params, positions):
        nconf = positions.shape[0]
        # e-ion
        d_ei = positions[:, :, None, :] - jnp.asarray(
            self.atom_coords, dtype=positions.dtype
        )[None, None, :, :]
        _, r_ei = self._dists(d_ei)  # (nconf, nelec, natom)
        a_vals = func3d.eval_basis_value(self.a_basis, r_ei)  # (..., natom, na)
        spin = jnp.asarray(self._spin)
        acoeff = params["acoeff"][:, :, spin]  # (natom, na, nelec)
        u_a = jnp.einsum("ceIk,Ike->c", a_vals, acoeff)
        # e-e upper triangle
        d_ee = positions[:, None, :, :] - positions[:, :, None, :]
        _, r_ee = self._dists(d_ee)  # (nconf, nelec, nelec)
        b_vals = func3d.eval_basis_value(self.b_basis, r_ee)  # (..., i, j, nb)
        chan = spin[:, None] + spin[None, :]  # (nelec, nelec) 0/1/2
        bc = params["bcoeff"][:, chan]  # (nb, nelec, nelec)
        iu = jnp.triu_indices(self.nelec, k=1)
        u_b = jnp.einsum(
            "cpk,kp->c", b_vals[:, iu[0], iu[1], :], bc[:, iu[0], iu[1]]
        )
        return u_a + u_b

    def _delta_terms(self, params, positions, e, epos, want_derivs):
        """U terms involving electron e with e at epos.

        epos: (nconf, 3) or (nconf, naux, 3). Returns (u_e, grad, lap) where
        grad/lap are None unless want_derivs; all evaluated at epos.
        """
        aux = epos.ndim == 3
        ep = epos if aux else epos[:, None, :]  # (nconf, A, 3)
        dtype = ep.dtype
        # ion part
        d_ei = ep[:, :, None, :] - jnp.asarray(self.atom_coords, dtype=dtype)[None, None]
        d_ei, r_ei = self._dists(d_ei)  # (nconf, A, natom)
        spin_e = (e >= self.nup).astype(jnp.int32)
        ac = params["acoeff"][:, :, spin_e]  # (natom, na)
        # ee part: displacements to all other electrons
        d_ee = ep[:, :, None, :] - positions[:, None, :, :]  # (nconf, A, nelec, 3)
        d_ee, r_ee = self._dists(d_ee)
        spin = jnp.asarray(self._spin)
        chan = spin_e + spin  # (nelec,)
        bc = params["bcoeff"][:, chan]  # (nb, nelec)
        notself = (jnp.arange(self.nelec) != e).astype(dtype)  # (nelec,)

        if not want_derivs:
            a_vals = func3d.eval_basis_value(self.a_basis, r_ei)
            b_vals = func3d.eval_basis_value(self.b_basis, r_ee)
            u = jnp.einsum("caIk,Ik->ca", a_vals, ac) + jnp.einsum(
                "cajk,kj,j->ca", b_vals, bc, notself
            )
            return (u if aux else u[:, 0]), None, None

        a_v, a_fr, a_lp = func3d.eval_basis_all(self.a_basis, r_ei)
        b_v, b_fr, b_lp = func3d.eval_basis_all(self.b_basis, r_ee)
        u = jnp.einsum("caIk,Ik->ca", a_v, ac) + jnp.einsum(
            "cajk,kj,j->ca", b_v, bc, notself
        )
        # grad: sum_k c_k (f'_k/r) * d_vec   (d_vec points from other to e)
        g = jnp.einsum("caIk,Ik,caIx->cax", a_fr, ac, d_ei) + jnp.einsum(
            "cajk,kj,j,cajx->cax", b_fr, bc, notself, d_ee
        )
        lap = jnp.einsum("caIk,Ik->ca", a_lp, ac) + jnp.einsum(
            "cajk,kj,j->ca", b_lp, bc, notself
        )
        if aux:
            return u, g, lap
        return u[:, 0], g[:, 0], lap[:, 0]

    # --- protocol ----------------------------------------------------------
    def recompute(self, params, positions):
        return JastrowState(positions=positions, u=self._u_total(params, positions))

    def value(self, params, state):
        one = jnp.ones_like(state.u)
        return one, state.u

    def testvalue(self, params, state, e, epos):
        u_new, _, _ = self._delta_terms(params, state.positions, e, epos, False)
        u_old, _, _ = self._delta_terms(
            params, state.positions, e, state.positions[:, e, :], False
        )
        if u_new.ndim == 2:  # aux axis
            du = u_new - u_old[:, None]
        else:
            du = u_new - u_old
        return jnp.exp(du), {"du": du, "epos": epos}

    def testvalue_many(self, params, state, epos):
        """exp(dU_e) for each electron e moved to epos; (nconf, nelec)."""
        positions = state.positions
        dtype = positions.dtype
        spin = jnp.asarray(self._spin)
        # a-part at epos for both spin channels
        d_ei = epos[:, None, :] - jnp.asarray(self.atom_coords, dtype)[None]
        _, r_ei = self._dists(d_ei)
        a_new = func3d.eval_basis_value(self.a_basis, r_ei)  # (c, I, k)
        a_eps = jnp.einsum("cIk,Iks->cs", a_new, params["acoeff"])  # (c, 2)
        # a-part at current positions per electron
        d_cur = positions[:, :, None, :] - jnp.asarray(self.atom_coords, dtype)[None, None]
        _, r_cur = self._dists(d_cur)
        a_cur = func3d.eval_basis_value(self.a_basis, r_cur)  # (c, n, I, k)
        acoeff_e = params["acoeff"][:, :, spin]  # (I, k, n)
        a_old = jnp.einsum("cnIk,Ikn->cn", a_cur, acoeff_e)
        # b-part at epos: T_s = sum_j bcoeff[k, s+spin_j] b_k(|epos - r_j|)
        d_ee = epos[:, None, :] - positions
        _, r_ee = self._dists(d_ee)
        b_new = func3d.eval_basis_value(self.b_basis, r_ee)  # (c, j, k)
        bc_j = params["bcoeff"][:, spin[None, :] + jnp.asarray([[0], [1]])]  # (k,2,n)
        T = jnp.einsum("cjk,ksj->cs", b_new, bc_j)  # (c, 2)
        # subtract the j=e self term (channel 2*spin_e)
        diag_b = b_new  # b from epos to electron e itself, per e: (c, e, k)
        bc_self = params["bcoeff"][:, 2 * spin]  # (k, n)
        sub = jnp.einsum("cek,ke->ce", diag_b, bc_self)
        u_new = a_eps[:, spin] + T[:, spin] - sub  # (c, n)
        # old b-part per electron from the full pair matrix
        d_full = positions[:, None, :, :] - positions[:, :, None, :]
        _, r_full = self._dists(d_full)
        b_full = func3d.eval_basis_value(self.b_basis, r_full)  # (c, i, j, k)
        chan = spin[:, None] + spin[None, :]
        bc_full = params["bcoeff"][:, chan]  # (k, i, j)
        mask = 1.0 - jnp.eye(self.nelec, dtype=dtype)
        b_old = jnp.einsum("cijk,kij,ij->ci", b_full, bc_full, mask)
        u_old = a_old + b_old
        return jnp.exp(u_new - u_old)

    def gradient_value(self, params, state, e, epos):
        u_new, g, _ = self._delta_terms(params, state.positions, e, epos, True)
        u_old, _, _ = self._delta_terms(
            params, state.positions, e, state.positions[:, e, :], False
        )
        ratio = jnp.exp(u_new - u_old)
        return g, ratio, {"du": u_new - u_old, "epos": epos}

    def gradient(self, params, state, e, epos):
        _, g, _ = self._delta_terms(params, state.positions, e, epos, True)
        return g

    def gradient_value_pair(self, params, state, e, epos_old, epos_new):
        X = jnp.stack([epos_old, epos_new], axis=1)
        u, g, _ = self._delta_terms(params, state.positions, e, X, True)
        du = u[:, 1] - u[:, 0]
        return g[:, 0], g[:, 1], jnp.exp(du), {"du": du, "epos": epos_new}

    def move_begin(self, params, state, e, epos):
        """Move protocol: ONE delta-terms evaluation at the current position
        yields both the drift gradient and u_old; u_old rides the aux slot so
        move_finish's ratio needs no second old-position pass (the naive
        gradient_current + gradient_value pairing evaluates the old-position
        terms twice more per move — measured as the dominant Jastrow cost of
        the latency-bound sweep)."""
        u_old, g, _ = self._delta_terms(params, state.positions, e, epos, True)
        return g, u_old

    def move_finish(self, params, state, e, epos, aux):
        u_new, g, _ = self._delta_terms(params, state.positions, e, epos, True)
        du = u_new - aux
        return g, jnp.exp(du), {"du": du, "epos": epos}

    def gradient_laplacian(self, params, state, e, epos):
        _, g, lap = self._delta_terms(params, state.positions, e, epos, True)
        return g, lap + jnp.sum(g * g, axis=-1)

    def updateinternals(self, params, state, e, epos, mask, saved):
        m = mask[:, None]
        newpos = state.positions.at[:, e, :].set(
            jnp.where(m, epos, state.positions[:, e, :])
        )
        newu = jnp.where(mask, state.u + saved["du"], state.u)
        return JastrowState(positions=newpos, u=newu)

    def pgradient(self, params, positions):
        """Analytic: U is linear in the coefficients (jastrowspin.py:457-464).

        dU/dacoeff[I,k,s] = sum_{i: spin_i = s} a_k(r_iI)
        dU/dbcoeff[k,ch]  = sum_{i<j: ch(i,j) = ch} b_k(r_ij)
        """
        dtype = positions.dtype
        spin = jnp.asarray(self._spin)
        d_ei = positions[:, :, None, :] - jnp.asarray(self.atom_coords, dtype)[None, None]
        _, r_ei = self._dists(d_ei)
        a_vals = func3d.eval_basis_value(self.a_basis, r_ei)  # (c, e, I, k)
        sone = (spin[:, None] == jnp.arange(2)[None, :]).astype(dtype)  # (e, 2)
        dA = jnp.einsum("ceIk,es->cIks", a_vals, sone)
        d_ee = positions[:, None, :, :] - positions[:, :, None, :]
        _, r_ee = self._dists(d_ee)
        b_vals = func3d.eval_basis_value(self.b_basis, r_ee)  # (c, i, j, k)
        chan = spin[:, None] + spin[None, :]
        iu = jnp.triu_indices(self.nelec, k=1)
        chone = (
            chan[iu[0], iu[1]][:, None] == jnp.arange(3)[None, :]
        ).astype(dtype)  # (npair, 3)
        dB = jnp.einsum("cpk,ph->ckh", b_vals[:, iu[0], iu[1], :], chone)
        return {"acoeff": dA, "bcoeff": dB}
