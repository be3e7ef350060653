"""General-twist k-point Slater determinant in REAL arithmetic.

Some TPU runtimes (e.g. the v5e backend used here) implement no complex ops
at all. TRIM twists are handled by orbital realification
(models/orbitals.KPointOrbitals realify); this module covers GENERAL twists
by embedding the complex n x n determinant matrix M in the 2n x 2n real
matrix

    E(M) = [[Re M, -Im M], [Im M, Re M]],   det E = |det M|^2,
    inv(E) = E(inv M).

Everything fixed-phase sampling needs is then available from real linear
algebra:
  * log|Psi| = 1/2 log det E,
  * the complex one-electron ratio r via the Re/Im blocks of inv(M),
  * Metropolis uses |r| = sqrt(r_re^2 + r_im^2),
  * drift/kinetic use Re(grad log Psi) and Re(lap Psi / Psi) — exactly the
    fixed-phase local energy (the phase-curvature term is contained in the
    real part),
  * a complex row replacement = two sequential real Sherman-Morrison row
    updates (rows j and n+j of E).

Single determinant per spin (the standard twist-averaging workload).
Protocol-compatible: `ratio` is the modulus |r| (complex wavefunctions skip
fixed-node sign logic anyway), phase is reported as 1.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linalg import slogdet_inv, sherman_morrison_row
from .orbitals import KPointOrbitals


class EmbeddedState(NamedTuple):
    inv_up: jax.Array  # (nconf, 2 nup, 2 nup) = inv of E(M_up)
    inv_dn: jax.Array
    logabs_up: jax.Array  # (nconf,) = log|det M_up|
    logabs_dn: jax.Array


def _embed(re, im):
    """(c, n, n) re/im -> (c, 2n, 2n) real embedding."""
    top = jnp.concatenate([re, -im], axis=-1)
    bot = jnp.concatenate([im, re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


class EmbeddedKSlater:
    """Fixed-phase general-twist Slater on real-only backends."""

    # testvalue returns |ratio|; the complex ratio's (re, im) pair is
    # exposed through testvalue_pair (used by ECP/T-move/OBDM accumulators)
    ratio_is_modulus = True

    def __init__(self, cell_or_supercell, orbitals: KPointOrbitals):
        self.nup, self.ndn = cell_or_supercell.nelec
        self.nelec = self.nup + self.ndn
        if orbitals.norb != (self.nup, self.ndn):
            raise ValueError(
                f"orbital counts {orbitals.norb} != nelec {(self.nup, self.ndn)}"
            )
        self.orbitals = orbitals

    def make_params(self):
        return self.orbitals.make_pair_params()

    # --- protocol ----------------------------------------------------------
    def recompute(self, params, positions):
        ur, ui, dr, di = self.orbitals.eval_pair(params, positions, 0)
        Eu = _embed(ur[:, : self.nup], ui[:, : self.nup])
        Ed = _embed(dr[:, self.nup :], di[:, self.nup :])
        _, lu, iu = slogdet_inv(Eu)
        _, ld, idn = slogdet_inv(Ed)
        return EmbeddedState(
            inv_up=iu, inv_dn=idn, logabs_up=0.5 * lu, logabs_dn=0.5 * ld
        )

    def value(self, params, state):
        la = state.logabs_up + state.logabs_dn
        return jnp.ones_like(la), la

    def _spin_row(self, e):
        pred = e < self.nup
        row_up = jnp.clip(e, 0, max(self.nup - 1, 0))
        row_dn = jnp.clip(e - self.nup, 0, max(self.ndn - 1, 0))
        return pred, row_up, row_dn

    def _complex_ratio(self, inv, n, row, new_re, new_im):
        """r = sum_i u_i inv(M)[i, row] from the embedded inverse.

        new_re/new_im: (..., n) possibly with aux axes before the last.
        """
        col_re = inv[:, :n, :][:, :, row]  # (c, n) Re inv(M)[:, row]
        col_im = inv[:, n:, :][:, :, row]  # (c, n) Im inv(M)[:, row]
        shape = new_re.shape[1:-1]
        cr = col_re.reshape(col_re.shape[:1] + (1,) * len(shape) + (n,))
        ci = col_im.reshape(cr.shape)
        r_re = jnp.sum(new_re * cr, axis=-1) - jnp.sum(new_im * ci, axis=-1)
        r_im = jnp.sum(new_re * ci, axis=-1) + jnp.sum(new_im * cr, axis=-1)
        return r_re, r_im

    def _ratio_pair(self, params, state, e, epos, mode):
        """Complex ratios (and derivative ratios) at epos, spin-selected."""
        pairs = self.orbitals.eval_pair(params, epos, mode)
        pred, row_up, row_dn = self._spin_row(e)

        def sel(idx_up_re, idx_up_im, idx_dn_re, idx_dn_im):
            ur, ui = pairs[idx_up_re], pairs[idx_up_im]
            dr, di = pairs[idx_dn_re], pairs[idx_dn_im]
            rr_u, ri_u = self._complex_ratio(state.inv_up, self.nup, row_up, ur, ui)
            rr_d, ri_d = self._complex_ratio(state.inv_dn, self.ndn, row_dn, dr, di)
            return (
                jnp.where(pred, rr_u, rr_d),
                jnp.where(pred, ri_u, ri_d),
            )

        out = [sel(0, 1, 2, 3)]
        if mode >= 1:
            out.append(sel(4, 5, 6, 7))
        if mode >= 2:
            out.append(sel(8, 9, 10, 11))
        # saved rows for updateinternals
        saved = {
            "up": (pairs[0], pairs[1]),
            "dn": (pairs[2], pairs[3]),
        }
        return out, saved

    def testvalue(self, params, state, e, epos):
        out, saved = self._ratio_pair(params, state, e, epos, 0)
        rr, ri = out[0]
        return jnp.sqrt(rr * rr + ri * ri), saved

    def testvalue_pair(self, params, state, e, epos):
        """Complex ratio as a REAL (re, im) pair — consumed by accumulators
        that need the phase/sign of the ratio (ECP nonlocal projection,
        T-moves, OBDM), not just the Metropolis modulus. Parity with the
        complex path's testvalue (reference wf/slater.py:300-335)."""
        out, saved = self._ratio_pair(params, state, e, epos, 0)
        rr, ri = out[0]
        return rr, ri, saved

    def testvalue_many(self, params, state, epos):
        rr, ri = self.testvalue_many_pair(params, state, epos)
        return jnp.sqrt(rr * rr + ri * ri)

    def testvalue_many_pair(self, params, state, epos):
        """(re, im) ratio pairs for replacing EACH electron by epos —
        phased ratios for density-matrix accumulators."""
        pairs = self.orbitals.eval_pair(params, epos, 0)
        colr, coli = [], []
        for e in range(self.nelec):
            pred, row_up, row_dn = self._spin_row(jnp.int32(e))
            if e < self.nup:
                rr, ri = self._complex_ratio(
                    state.inv_up, self.nup, row_up, pairs[0], pairs[1]
                )
            else:
                rr, ri = self._complex_ratio(
                    state.inv_dn, self.ndn, row_dn, pairs[2], pairs[3]
                )
            colr.append(rr)
            coli.append(ri)
        return jnp.stack(colr, axis=1), jnp.stack(coli, axis=1)

    def gradient_value(self, params, state, e, epos):
        out, saved = self._ratio_pair(params, state, e, epos, 1)
        (rr, ri), (gr, gi) = out  # gr/gi: (c, 3)
        mod2 = rr * rr + ri * ri
        # grad log psi = g / r;  Re = (gr rr + gi ri)/|r|^2
        grad = (gr * rr[:, None] + gi * ri[:, None]) / mod2[:, None]
        return grad, jnp.sqrt(mod2), saved

    def gradient(self, params, state, e, epos):
        g, _, _ = self.gradient_value(params, state, e, epos)
        return g

    def gradient_laplacian(self, params, state, e, epos):
        g, _, lap, _ = self.gradient_laplacian_pair(params, state, e, epos)
        return g, lap

    def gradient_laplacian_pair(self, params, state, e, epos):
        """Complex grad log Psi and lap Psi/Psi as REAL (re, im) pairs.

        The imaginary parts (phase gradient/curvature) feed the
        complex-channel local energy E_I used by the SR gradient of
        general-twist wavefunctions (observables/sr.py docstring)."""
        out, _ = self._ratio_pair(params, state, e, epos, 2)
        (rr, ri), (gr, gi), (lr, li) = out
        mod2 = rr * rr + ri * ri
        g_re = (gr * rr[:, None] + gi * ri[:, None]) / mod2[:, None]
        g_im = (gi * rr[:, None] - gr * ri[:, None]) / mod2[:, None]
        l_re = (lr * rr + li * ri) / mod2
        l_im = (li * rr - lr * ri) / mod2
        return g_re, g_im, l_re, l_im

    def updateinternals(self, params, state, e, epos, mask, saved):
        pred, row_up, row_dn = self._spin_row(e)

        def upd(inv, logabs, n, row, new_re, new_im):
            # embedding rows: row -> [re, -im]; n+row -> [im, re]
            row1 = jnp.concatenate([new_re, -new_im], axis=-1)
            row2 = jnp.concatenate([new_im, new_re], axis=-1)
            r1, inv1 = sherman_morrison_row(inv, row1, row)
            r2, inv2 = sherman_morrison_row(inv1, row2, n + row)
            # r1*r2 = |r|^2 > 0
            tiny = jnp.finfo(logabs.dtype).tiny
            la = logabs + 0.5 * jnp.log(jnp.maximum(r1 * r2, tiny))
            return inv2, la

        def up_branch(st):
            inv2, la = upd(
                st.inv_up, st.logabs_up, self.nup, row_up,
                saved["up"][0], saved["up"][1],
            )
            m = mask[:, None]
            return st._replace(
                inv_up=jnp.where(m[..., None], inv2, st.inv_up),
                logabs_up=jnp.where(mask, la, st.logabs_up),
            )

        def dn_branch(st):
            inv2, la = upd(
                st.inv_dn, st.logabs_dn, self.ndn, row_dn,
                saved["dn"][0], saved["dn"][1],
            )
            m = mask[:, None]
            return st._replace(
                inv_dn=jnp.where(m[..., None], inv2, st.inv_dn),
                logabs_dn=jnp.where(mask, la, st.logabs_dn),
            )

        if self.ndn == 0:
            return up_branch(state)
        if self.nup == 0:
            return dn_branch(state)
        return jax.lax.cond(pred, up_branch, dn_branch, state)

    def pgradient(self, params, positions):
        """Analytic fixed-phase d log|Psi| / d mo_coeff (re/im directions) —
        the real channel of pgradient_pair."""
        re, _ = self.pgradient_pair(params, positions)
        return re

    def pgradient_pair(self, params, positions):
        """(re, im) parameter-gradient trees: re = d log|Psi| / d theta,
        im = d arg(Psi) / d theta (phase channel for the complex SR
        gradient, observables/sr.py docstring).

        The complex inverse blocks come straight from the embedded inverse
        (inv(E) = E(inv M)); D[a, j] = sum_i kao[i, a] invM[j, i] is the
        holomorphic tr(M^-1 dM) derivative per k-block (parity with
        /root/reference/pyqmc/wf/slater.py:462-542), giving
            d log Psi / dC_re = D    -> (Re D, Im D)
            d log Psi / dC_im = i D  -> (-Im D, Re D).
        """
        state = self.recompute(params, positions)
        are, aim = self.orbitals._kaos_pair(positions, 0)[0]  # (c, ne, nk, nao)
        nconf = positions.shape[0]
        out, outi = {}, {}
        for inv, n, sl, tag in (
            (state.inv_up, self.nup, slice(0, self.nup), "alpha"),
            (state.inv_dn, self.ndn, slice(self.nup, None), "beta"),
        ):
            re_name, im_name = f"mo_coeff_{tag}_re", f"mo_coeff_{tag}_im"
            blocks = params[re_name]
            if n == 0:
                zeros = [jnp.zeros((nconf,) + b.shape, b.dtype) for b in blocks]
                out[re_name] = zeros
                out[im_name] = list(zeros)
                outi[re_name] = list(zeros)
                outi[im_name] = list(zeros)
                continue
            invr = inv[:, :n, :n]  # Re inv(M)
            invi = inv[:, n:, :n]  # Im inv(M)
            grads_re, grads_im = [], []
            phase_re, phase_im = [], []
            off = 0
            for k, b in enumerate(blocks):
                nocc_k = b.shape[1]
                akr, aki = are[:, sl, k, :], aim[:, sl, k, :]  # (c, n, nao)
                ir = invr[:, off : off + nocc_k, :]  # (c, nocc_k, n)
                ii = invi[:, off : off + nocc_k, :]
                dr = jnp.einsum("cia,cji->caj", akr, ir) - jnp.einsum(
                    "cia,cji->caj", aki, ii
                )
                di = jnp.einsum("cia,cji->caj", akr, ii) + jnp.einsum(
                    "cia,cji->caj", aki, ir
                )
                grads_re.append(dr)
                grads_im.append(-di)
                phase_re.append(di)
                phase_im.append(dr)
                off += nocc_k
            out[re_name] = grads_re
            out[im_name] = grads_im
            outi[re_name] = phase_re
            outi[im_name] = phase_im
        return out, outi
