"""Multi-determinant general-twist Slater in complex-PAIR arithmetic.

Completes the real-only-backend story (see slater_embedded.py, which covers
single determinants via the real embedding): the full multi-determinant
k-point expansion

    Psi = sum_d c_d D_up^{(d)} D_dn^{(d)}      (complex determinants)

evaluated entirely with (re, im) real-array pairs — pair LU for recompute
(ops/cpair.pair_lu_slogdet_inv gives phases too), pair Sherman-Morrison for
updates, pair log-space expansion combination. Protocol outputs are the
fixed-phase sampling quantities: |ratio|, Re(grad log Psi), Re(lap Psi/Psi),
and log|Psi| (value phase reported as 1).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import cpair
from .orbitals import KPointOrbitals
from .slater import DeterminantExpansion


class PairSlaterState(NamedTuple):
    iur: jax.Array  # (c, ndu, nup, nup) Re inv
    iui: jax.Array
    idr: jax.Array
    idi: jax.Array
    pur: jax.Array  # (c, ndu) det phase pairs
    pui: jax.Array
    pdr: jax.Array
    pdi: jax.Array
    lu: jax.Array  # (c, ndu) log|det|
    ld: jax.Array


class PairKSlater:
    """General-twist multi-determinant Slater on real-only backends."""

    # testvalue returns |ratio|; the complex ratio's (re, im) pair is
    # exposed through testvalue_pair (used by ECP/T-move/OBDM accumulators)
    ratio_is_modulus = True

    def __init__(self, cell_or_supercell, orbitals: KPointOrbitals, expansion,
                 det_coeff=None):
        self.nup, self.ndn = cell_or_supercell.nelec
        self.nelec = self.nup + self.ndn
        self.orbitals = orbitals
        self.expansion = expansion
        if det_coeff is None:
            det_coeff = np.ones(len(expansion.map_up))
        self._det_coeff0 = jnp.asarray(np.real(det_coeff))

    def make_params(self):
        p = {"det_coeff": self._det_coeff0}
        p.update(self.orbitals.make_pair_params())
        return p

    # --- helpers -----------------------------------------------------------
    def _det_matrices(self, mr, mi, occ):
        nconf, ns = mr.shape[0], mr.shape[1]
        occf = jnp.asarray(occ.reshape(-1))
        outr = mr[:, :, occf].reshape(nconf, ns, *occ.shape).transpose(0, 2, 1, 3)
        outi = mi[:, :, occf].reshape(nconf, ns, *occ.shape).transpose(0, 2, 1, 3)
        return outr, outi

    def _expansion_weights(self, params, state):
        """w pair (c, ndet), denom pair (c,), ref (c,)."""
        mu = jnp.asarray(self.expansion.map_up)
        md = jnp.asarray(self.expansion.map_dn)
        logs = state.lu[:, mu] + state.ld[:, md]
        phr, phi = cpair.cmul(
            state.pur[:, mu], state.pui[:, mu], state.pdr[:, md], state.pdi[:, md]
        )
        ref = jnp.max(logs, axis=1, keepdims=True)
        amp = params["det_coeff"][None, :] * jnp.exp(logs - ref)
        wr, wi = phr * amp, phi * amp
        return wr, wi, jnp.sum(wr, axis=1), jnp.sum(wi, axis=1), ref[:, 0]

    def value(self, params, state):
        _, _, dr, di, ref = self._expansion_weights(params, state)
        mod = jnp.sqrt(jnp.maximum(cpair.cabs2(dr, di), jnp.finfo(dr.dtype).tiny))
        return jnp.ones_like(mod), jnp.log(mod) + ref

    def value_pair(self, params, state):
        """(phase_re, phase_im, log|Psi|): the unit-modulus wavefunction
        phase as a REAL pair — the pair LU tracks determinant phases, so
        unlike the embedded tier the full phase is available (consumed by
        SymmetryAccumulator on real-only backends)."""
        _, _, dr, di, ref = self._expansion_weights(params, state)
        mod = jnp.sqrt(jnp.maximum(cpair.cabs2(dr, di), jnp.finfo(dr.dtype).tiny))
        return dr / mod, di / mod, jnp.log(mod) + ref

    def recompute(self, params, positions):
        ur, ui, dr_, di_ = self.orbitals.eval_pair(params, positions, 0)
        mur, mui = self._det_matrices(
            ur[:, : self.nup], ui[:, : self.nup], self.expansion.occ_up
        )
        mdr, mdi = self._det_matrices(
            dr_[:, self.nup :], di_[:, self.nup :], self.expansion.occ_dn
        )
        pur, pui, lu, iur, iui = cpair.pair_lu_slogdet_inv(mur, mui)
        pdr, pdi, ld, idr, idi = cpair.pair_lu_slogdet_inv(mdr, mdi)
        return PairSlaterState(iur, iui, idr, idi, pur, pui, pdr, pdi, lu, ld)

    def _spin_row(self, e):
        pred = e < self.nup
        row_up = jnp.clip(e, 0, max(self.nup - 1, 0))
        row_dn = jnp.clip(e - self.nup, 0, max(self.ndn - 1, 0))
        return pred, row_up, row_dn

    def _det_ratios(self, mr, mi, invr, invi, occ, row):
        """Per-unique-det complex ratio pair; m: (c[, A], norb)."""
        colr = invr[:, :, :, row]  # (c, nd, n)
        coli = invi[:, :, :, row]
        nd, n = occ.shape
        occf = jnp.asarray(occ.reshape(-1))
        sr = mr[..., occf].reshape(mr.shape[:-1] + (nd, n))
        si = mi[..., occf].reshape(mi.shape[:-1] + (nd, n))
        if sr.ndim == 3:
            rr = jnp.einsum("ckj,ckj->ck", sr, colr) - jnp.einsum(
                "ckj,ckj->ck", si, coli
            )
            ri = jnp.einsum("ckj,ckj->ck", sr, coli) + jnp.einsum(
                "ckj,ckj->ck", si, colr
            )
        else:
            rr = jnp.einsum("cakj,ckj->cak", sr, colr) - jnp.einsum(
                "cakj,ckj->cak", si, coli
            )
            ri = jnp.einsum("cakj,ckj->cak", sr, coli) + jnp.einsum(
                "cakj,ckj->cak", si, colr
            )
        return rr, ri

    def _ratio_terms(self, params, state, e, pairs4):
        """Expansion ratio pair (num/denom) for electron e.

        pairs4 = (up_re, up_im, dn_re, dn_im) MO arrays at the new
        position(s). Returns (num_r, num_i, den_r, den_i).
        """
        ur, ui, dr_, di_ = pairs4
        pred, row_up, row_dn = self._spin_row(e)
        mu = jnp.asarray(self.expansion.map_up)
        md = jnp.asarray(self.expansion.map_dn)
        rur, rui = self._det_ratios(
            ur, ui, state.iur, state.iui, self.expansion.occ_up, row_up
        )
        rdr, rdi = self._det_ratios(
            dr_, di_, state.idr, state.idi, self.expansion.occ_dn, row_dn
        )
        rr = jnp.where(pred, rur[..., mu], rdr[..., md])
        ri = jnp.where(pred, rui[..., mu], rdi[..., md])
        wr, wi, denr, deni, _ = self._expansion_weights(params, state)
        if rr.ndim == 3:
            numr = jnp.einsum("cad,cd->ca", rr, wr) - jnp.einsum(
                "cad,cd->ca", ri, wi
            )
            numi = jnp.einsum("cad,cd->ca", rr, wi) + jnp.einsum(
                "cad,cd->ca", ri, wr
            )
            return numr, numi, denr[:, None], deni[:, None]
        numr = jnp.sum(rr * wr - ri * wi, axis=1)
        numi = jnp.sum(rr * wi + ri * wr, axis=1)
        return numr, numi, denr, deni

    # --- protocol ------------------------------------------------------------
    def testvalue(self, params, state, e, epos):
        pairs = self.orbitals.eval_pair(params, epos, 0)
        nr, ni, dr_, di_ = self._ratio_terms(params, state, e, pairs)
        qr, qi = cpair.cdiv(nr, ni, dr_, di_)
        saved = {"pairs": pairs}
        return jnp.sqrt(cpair.cabs2(qr, qi)), saved

    def testvalue_pair(self, params, state, e, epos):
        """Complex ratio as a REAL (re, im) pair — for accumulators that
        need the ratio's phase (ECP nonlocal projection, T-moves, OBDM),
        not just the Metropolis modulus."""
        pairs = self.orbitals.eval_pair(params, epos, 0)
        nr, ni, dr_, di_ = self._ratio_terms(params, state, e, pairs)
        qr, qi = cpair.cdiv(nr, ni, dr_, di_)
        return qr, qi, {"pairs": pairs}

    def testvalue_many(self, params, state, epos):
        rr, ri = self.testvalue_many_pair(params, state, epos)
        return jnp.sqrt(cpair.cabs2(rr, ri))

    def testvalue_many_pair(self, params, state, epos):
        """(re, im) ratio pairs for replacing EACH electron by epos —
        phased ratios for density-matrix accumulators (cf. reference
        obdm.py:134-191 which consumes complex testvalue_many)."""
        pairs = self.orbitals.eval_pair(params, epos, 0)
        colr, coli = [], []
        for e in range(self.nelec):
            nr, ni, dr_, di_ = self._ratio_terms(
                params, state, jnp.int32(e), pairs
            )
            qr, qi = cpair.cdiv(nr, ni, dr_, di_)
            colr.append(qr)
            coli.append(qi)
        return jnp.stack(colr, axis=1), jnp.stack(coli, axis=1)

    def gradient_value(self, params, state, e, epos):
        out = self.orbitals.eval_pair(params, epos, 1)
        v_pairs, g_pairs = out[:4], out[4:]
        nr, ni, dr_, di_ = self._ratio_terms(params, state, e, v_pairs)
        # gradient numerators: treat the 3-axis like an aux axis
        gp = tuple(p.reshape(p.shape[0], 3, -1) for p in g_pairs)
        gnr, gni, _, _ = self._ratio_terms(params, state, e, gp)
        # grad log psi = g_num / v_num (complex); take Re
        gr, gi = cpair.cdiv(gnr, gni, nr[:, None], ni[:, None])
        qr, qi = cpair.cdiv(nr, ni, dr_, di_)
        saved = {"pairs": v_pairs}
        return gr, jnp.sqrt(cpair.cabs2(qr, qi)), saved

    def gradient(self, params, state, e, epos):
        g, _, _ = self.gradient_value(params, state, e, epos)
        return g

    def gradient_laplacian(self, params, state, e, epos):
        gr, _, lr, _ = self.gradient_laplacian_pair(params, state, e, epos)
        return gr, lr

    def gradient_laplacian_pair(self, params, state, e, epos):
        """Complex grad/lap of log Psi as REAL (re, im) pairs.

        The imaginary parts (phase gradient/curvature) feed the
        complex-channel local energy E_I used by the SR gradient of
        general-twist wavefunctions (observables/sr.py docstring)."""
        out = self.orbitals.eval_pair(params, epos, 2)
        v_pairs, g_pairs, l_pairs = out[:4], out[4:8], out[8:]
        nr, ni, _, _ = self._ratio_terms(params, state, e, v_pairs)
        gp = tuple(p.reshape(p.shape[0], 3, -1) for p in g_pairs)
        gnr, gni, _, _ = self._ratio_terms(params, state, e, gp)
        lnr, lni, _, _ = self._ratio_terms(params, state, e, l_pairs)
        gr, gi = cpair.cdiv(gnr, gni, nr[:, None], ni[:, None])
        lr, li = cpair.cdiv(lnr, lni, nr, ni)
        return gr, gi, lr, li

    def updateinternals(self, params, state, e, epos, mask, saved):
        pred, row_up, row_dn = self._spin_row(e)
        ur, ui, dr_, di_ = saved["pairs"]

        def upd(invr, invi, phr, phi, logd, occ, mr, mi, row):
            nd, n = occ.shape
            occf = jnp.asarray(occ.reshape(-1))
            rowsr = mr[:, occf].reshape(mr.shape[0], nd, n)
            rowsi = mi[:, occf].reshape(mi.shape[0], nd, n)
            rr, ri, nir, nii = cpair.pair_sherman_morrison_row(
                invr, invi, rowsr, rowsi, row
            )
            am = jnp.sqrt(jnp.maximum(cpair.cabs2(rr, ri), jnp.finfo(rr.dtype).tiny))
            npr, npi = cpair.cmul(phr, phi, rr / am, ri / am)
            return nir, nii, npr, npi, logd + jnp.log(am)

        def up_branch(st):
            nir, nii, npr, npi, nl = upd(
                st.iur, st.iui, st.pur, st.pui, st.lu,
                self.expansion.occ_up, ur, ui, row_up,
            )
            m2 = mask[:, None]
            m4 = mask[:, None, None, None]
            return st._replace(
                iur=jnp.where(m4, nir, st.iur), iui=jnp.where(m4, nii, st.iui),
                pur=jnp.where(m2, npr, st.pur), pui=jnp.where(m2, npi, st.pui),
                lu=jnp.where(m2, nl, st.lu),
            )

        def dn_branch(st):
            nir, nii, npr, npi, nl = upd(
                st.idr, st.idi, st.pdr, st.pdi, st.ld,
                self.expansion.occ_dn, dr_, di_, row_dn,
            )
            m2 = mask[:, None]
            m4 = mask[:, None, None, None]
            return st._replace(
                idr=jnp.where(m4, nir, st.idr), idi=jnp.where(m4, nii, st.idi),
                pdr=jnp.where(m2, npr, st.pdr), pdi=jnp.where(m2, npi, st.pdi),
                ld=jnp.where(m2, nl, st.ld),
            )

        if self.ndn == 0:
            return up_branch(state)
        if self.nup == 0:
            return dn_branch(state)
        return jax.lax.cond(pred, up_branch, dn_branch, state)

    def pgradient(self, params, positions):
        """Analytic fixed-phase parameter gradients d log|Psi| / d theta
        (the real channel of pgradient_pair)."""
        re, _ = self.pgradient_pair(params, positions)
        return re

    def pgradient_pair(self, params, positions):
        """(re, im) parameter-gradient trees: re = d log|Psi| / d theta,
        im = d arg(Psi) / d theta, both real pytrees shaped like params.

        det_coeff: (w_d / denom) / c_d split into (Re, Im). Orbital
        coefficients (stored as re/im real arrays,
        KPointOrbitals.make_pair_params): the holomorphic
        D = d log Psi / dC is built from tr(M^-1 dM) in pair arithmetic —
        the same machinery as Slater._pgradient_kpoint (parity with
        /root/reference/pyqmc/wf/slater.py:462-542) — and projected onto
        the real directions:
            d log Psi / dC_re = D    -> (Re D, Im D)
            d log Psi / dC_im = i D  -> (-Im D, Re D)
        The im tree is the phase-derivative channel consumed by the
        complex-parameter SR gradient (observables/sr.py docstring).
        """
        state = self.recompute(params, positions)
        wr, wi, dr_, di_, _ = self._expansion_weights(params, state)
        # d log psi / d c_d = (w_d / c_d) / denom
        qr, qi = cpair.cdiv(wr, wi, dr_[:, None], di_[:, None])
        out = {"det_coeff": qr / params["det_coeff"][None, :]}
        outi = {"det_coeff": qi / params["det_coeff"][None, :]}

        are, aim = self.orbitals._kaos_pair(positions, 0)[0]  # (c, ne, nk, nao)
        mu = jnp.asarray(self.expansion.map_up)
        md = jnp.asarray(self.expansion.map_dn)
        nconf = positions.shape[0]
        for invr, invi, occ, mp, sl, tag in (
            (state.iur, state.iui, self.expansion.occ_up, mu,
             slice(0, self.nup), "alpha"),
            (state.idr, state.idi, self.expansion.occ_dn, md,
             slice(self.nup, None), "beta"),
        ):
            re_name, im_name = f"mo_coeff_{tag}_re", f"mo_coeff_{tag}_im"
            blocks = params[re_name]
            nd, n = occ.shape
            if n == 0:
                zeros = [jnp.zeros((nconf,) + b.shape, b.dtype) for b in blocks]
                out[re_name] = zeros
                out[im_name] = list(zeros)
                outi[re_name] = list(zeros)
                outi[im_name] = list(zeros)
                continue
            # per-unique-det complex weight: sum_terms w [map(term) = d] / denom
            sel = (mp[:, None] == jnp.arange(nd)[None, :]).astype(wr.dtype)
            wkr, wki = cpair.cdiv(
                wr @ sel, wi @ sel, dr_[:, None], di_[:, None]
            )
            occf = jnp.asarray(occ)  # (nd, n)
            grads_re, grads_im = [], []
            phase_re, phase_im = [], []
            off = 0
            for k, b in enumerate(blocks):
                nocc_k = b.shape[1]
                akr, aki = are[:, sl, k, :], aim[:, sl, k, :]  # (c, n_s, nao)
                # t = M^-1 @ ao (complex): (c, nd, n, nao)
                tr = jnp.einsum("ckji,cim->ckjm", invr, akr) - jnp.einsum(
                    "ckji,cim->ckjm", invi, aki
                )
                ti = jnp.einsum("ckji,cim->ckjm", invr, aki) + jnp.einsum(
                    "ckji,cim->ckjm", invi, akr
                )
                onehot = (
                    occf[..., None] == (off + jnp.arange(nocc_k))
                ).astype(wr.dtype)  # (nd, n, nocc_k)
                dr_k = jnp.einsum("ck,ckjm,kjo->cmo", wkr, tr, onehot) - (
                    jnp.einsum("ck,ckjm,kjo->cmo", wki, ti, onehot)
                )
                di_k = jnp.einsum("ck,ckjm,kjo->cmo", wkr, ti, onehot) + (
                    jnp.einsum("ck,ckjm,kjo->cmo", wki, tr, onehot)
                )
                grads_re.append(dr_k)
                grads_im.append(-di_k)
                phase_re.append(di_k)
                phase_im.append(dr_k)
                off += nocc_k
            out[re_name] = grads_re
            out[im_name] = grads_im
            outi[re_name] = phase_re
            outi[im_name] = phase_im
        return out, outi
