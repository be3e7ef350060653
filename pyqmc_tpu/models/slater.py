"""Multi-determinant Slater wavefunction, TPU-native.

Functional redesign of pyqmc/wf/slater.py (and its JAX seed,
pyqmc/wf/jax/slater.py:16-103,256-410):

  * state is a NamedTuple of arrays resident in HBM: per-spin determinant
    inverses, phases and log-determinants (the union of the reference's
    _aovals/_dets/_inverse caches, slater.py:233-259);
  * all methods are pure, batched over walkers, and take the electron index
    as a *traced* scalar so the whole electron sweep compiles into one
    lax.scan (no per-electron host round-trips, cf. slater.py:401,413);
  * spin selection is branchless (both spin channels' small det-ratio
    contractions are computed and selected) except updateinternals, which
    uses lax.cond so only one spin's O(ndet n^2) Sherman-Morrison runs;
  * determinant expansion combined in log space with per-walker max-shift
    (determinant_tools.py:74-88 semantics).

Works for real and complex dtypes ("phase" = +-1 or unit-modulus complex).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.gto import GTOSpec
from ..ops.linalg import slogdet_inv, sherman_morrison_row
from .orbitals import MolecularOrbitals


class SlaterState(NamedTuple):
    inv_up: jax.Array  # (nconf, ndu, nup, nup)
    inv_dn: jax.Array  # (nconf, ndd, ndn, ndn)
    phase_up: jax.Array  # (nconf, ndu)
    logdet_up: jax.Array
    phase_dn: jax.Array
    logdet_dn: jax.Array
    # cached per-electron orbital values+gradients at each electron's
    # CURRENT position, slot 0 = value, 1:4 = gradient. Maintained by
    # recompute/updateinternals so the Metropolis sweep's drift at the
    # current position (gradient_current) costs a small contraction
    # instead of a full AO evaluation (the reference re-evaluates the
    # orbitals for the old-position drift every move, mc.py:112-124).
    mog_up: jax.Array  # (nconf, nup, 4, norb_up)
    mog_dn: jax.Array  # (nconf, ndn, 4, norb_dn)


@dataclasses.dataclass(frozen=True)
class DeterminantExpansion:
    """Static determinant bookkeeping (cf. determinant_tools.py:39-71).

    Unique spin-determinants are listed per spin; the expansion refers to
    them through map_up/map_dn.
    """

    occ_up: np.ndarray  # (ndu, nup) orbital indices
    occ_dn: np.ndarray  # (ndd, ndn)
    map_up: np.ndarray  # (ndet,)
    map_dn: np.ndarray  # (ndet,)

    def __hash__(self):
        return hash(
            (self.occ_up.tobytes(), self.occ_dn.tobytes(),
             self.map_up.tobytes(), self.map_dn.tobytes())
        )

    def __eq__(self, other):
        return (
            np.array_equal(self.occ_up, other.occ_up)
            and np.array_equal(self.occ_dn, other.occ_dn)
            and np.array_equal(self.map_up, other.map_up)
            and np.array_equal(self.map_dn, other.map_dn)
        )

    @staticmethod
    def single(nup, ndn):
        return DeterminantExpansion(
            occ_up=np.arange(nup)[None, :],
            occ_dn=np.arange(ndn)[None, :],
            map_up=np.zeros(1, dtype=np.int64),
            map_dn=np.zeros(1, dtype=np.int64),
        )


class Slater:
    """Static configuration + pure methods; parameters passed explicitly.

    params pytree: {"det_coeff": (ndet,), "mo_coeff_alpha": (nao, norb_up),
                    "mo_coeff_beta": (nao, norb_dn)}
    """

    def __init__(self, mol, orbitals, expansion, mo_coeff=None, det_coeff=None):
        """orbitals: a MolecularOrbitals/KPointOrbitals evaluator, or None to
        build MolecularOrbitals from mo_coeff (back-compat)."""
        self.nup, self.ndn = mol.nelec
        self.nelec = self.nup + self.ndn
        if (expansion.occ_up.shape[1] != self.nup
                or expansion.occ_dn.shape[1] != self.ndn):
            raise ValueError(
                "DeterminantExpansion electron counts "
                f"({expansion.occ_up.shape[1]} up, "
                f"{expansion.occ_dn.shape[1]} dn) do not match mol.nelec "
                f"{mol.nelec}"
            )
        if orbitals is None:
            orbitals = MolecularOrbitals(mol, mo_coeff)
        self.orbitals = orbitals
        self.expansion = expansion
        if det_coeff is None:
            det_coeff = np.ones(len(expansion.map_up))
        self._det_coeff0 = jnp.asarray(det_coeff)

    # ------------------------------------------------------------------
    @staticmethod
    def from_mean_field(mf, tol=None):
        """Single-determinant Slater from an SCF solution."""
        mol = mf.mol
        nup, ndn = mol.nelec
        ca = mf.mo_coeff[0][:, :nup]
        cb = mf.mo_coeff[1][:, :ndn]
        return Slater(mol, None, DeterminantExpansion.single(nup, ndn), (ca, cb))

    def make_params(self):
        p = {"det_coeff": self._det_coeff0}
        p.update(self.orbitals.make_params())
        return p

    # --- helpers ---------------------------------------------------------
    def _det_matrices(self, mo, occ):
        """mo (nconf, n_s, norb) -> (nconf, nd, n_s, n_s)."""
        nconf, ns = mo.shape[0], mo.shape[1]
        occf = jnp.asarray(occ.reshape(-1))
        m = mo[:, :, occf].reshape(nconf, ns, occ.shape[0], occ.shape[1])
        return m.transpose(0, 2, 1, 3)

    def _det_ratios(self, mo_new, inv, occ, row):
        """r_k = sum_j mo_new[occ[k,j]] inv[k, j, row]  (per unique det).

        mo_new: (nconf, [naux,] norb); inv: (nconf, nd, n, n); row traced.
        Returns (nconf, [naux,] nd).
        """
        col = inv[:, :, :, row]  # (nconf, nd, n)
        nconf = mo_new.shape[0]
        nd, n = occ.shape
        occf = jnp.asarray(occ.reshape(-1))
        sel = mo_new[..., occf].reshape(mo_new.shape[:-1] + (nd, n))
        if sel.ndim == 3:  # (nconf, nd, n)
            return jnp.einsum("ckj,ckj->ck", sel, col)
        return jnp.einsum("cakj,ckj->cak", sel, col)  # aux axis

    def _expansion_weights(self, params, state):
        """Signed, max-shifted weights w_d = c_d phase_d e^{log_d - ref}.

        Returns (w (nconf, ndet), denom (nconf,), ref (nconf,)).
        """
        mu = jnp.asarray(self.expansion.map_up)
        md = jnp.asarray(self.expansion.map_dn)
        logs = state.logdet_up[:, mu] + state.logdet_dn[:, md]
        phase = state.phase_up[:, mu] * state.phase_dn[:, md]
        ref = jnp.max(logs, axis=1, keepdims=True)
        w = params["det_coeff"][None, :] * phase * jnp.exp(logs - ref)
        return w, jnp.sum(w, axis=1), ref[:, 0]

    # --- protocol ---------------------------------------------------------
    def recompute(self, params, positions):
        mo_up_all, mo_dn_all, gmo_up_all, gmo_dn_all = self.orbitals.eval(
            params, positions, 1
        )
        mo_up = mo_up_all[:, : self.nup]
        mo_dn = mo_dn_all[:, self.nup :]
        m_up = self._det_matrices(mo_up, self.expansion.occ_up)
        m_dn = self._det_matrices(mo_dn, self.expansion.occ_dn)
        pu, lu, iu = slogdet_inv(m_up)
        pd, ld, idn = slogdet_inv(m_dn)
        return SlaterState(
            inv_up=iu, inv_dn=idn, phase_up=pu, logdet_up=lu,
            phase_dn=pd, logdet_dn=ld,
            mog_up=jnp.concatenate(
                [mo_up[:, :, None, :], gmo_up_all[:, : self.nup]], axis=2
            ),
            mog_dn=jnp.concatenate(
                [mo_dn[:, :, None, :], gmo_dn_all[:, self.nup :]], axis=2
            ),
        )

    def value(self, params, state):
        """(phase, logabs) of the full expansion."""
        w, denom, ref = self._expansion_weights(params, state)
        absd = jnp.abs(denom)
        # guard: exactly-zero expansion (node) -> tiny value
        safe = jnp.where(absd == 0, 1e-300 if absd.dtype == jnp.float64 else 1e-30, absd)
        return denom / safe, jnp.log(safe) + ref

    def _spin_row(self, e):
        pred = e < self.nup
        row_up = jnp.clip(e, 0, self.nup - 1)
        row_dn = jnp.clip(e - self.nup, 0, max(self.ndn - 1, 0))
        return pred, row_up, row_dn

    def _ratio_terms(self, params, state, e, mo_up_new, mo_dn_new):
        """Expansion ratio for replacing electron e with given MO values."""
        pred, row_up, row_dn = self._spin_row(e)
        mu = jnp.asarray(self.expansion.map_up)
        md = jnp.asarray(self.expansion.map_dn)
        if self.ndn == 0:
            r = self._det_ratios(
                mo_up_new, state.inv_up, self.expansion.occ_up, row_up
            )[..., mu]
        elif self.nup == 0:
            r = self._det_ratios(
                mo_dn_new, state.inv_dn, self.expansion.occ_dn, row_dn
            )[..., md]
        else:
            r_up = self._det_ratios(
                mo_up_new, state.inv_up, self.expansion.occ_up, row_up
            )
            r_dn = self._det_ratios(
                mo_dn_new, state.inv_dn, self.expansion.occ_dn, row_dn
            )
            r = jnp.where(pred, r_up[..., mu], r_dn[..., md])  # (nconf[, naux], ndet)
        w, denom, _ = self._expansion_weights(params, state)
        if r.ndim == 3:
            num = jnp.einsum("cad,cd->ca", r, w)
            return num / denom[:, None]
        num = jnp.einsum("cd,cd->c", r, w)
        return num / denom

    def testvalue(self, params, state, e, epos):
        """Psi(..., r_e=epos, ...)/Psi. epos (nconf, 3) or (nconf, naux, 3)."""
        mo_up, mo_dn = self.orbitals.eval(params, epos, 0)
        ratio = self._ratio_terms(params, state, e, mo_up, mo_dn)
        saved = {"mo_up": mo_up, "mo_dn": mo_dn}
        return ratio, saved

    def testvalue_aux_all(self, params, state, aux, es=None):
        """Ratios (ne, nconf, naux) for replacing electron es[i] with
        aux[i] (ne, nconf, naux, 3) — the ECP quadrature pattern. es None
        means aux covers ALL electrons in order; otherwise es is a STATIC
        sequence of electron indices (mixed spins allowed) — the ECP pass
        chunks electrons to bound the aux-point batch and each chunk is an
        arbitrary subset.

        The orbital evaluation is electron-independent, so it runs ONCE on
        the flat (ne*nconf*naux, 3) point set (where the fused Pallas
        GTO+MO kernel is ~4x the vmapped XLA path on v5e); only the cheap
        det-ratio contraction is vmapped over the electron index.

        Single-determinant fast path: the ratio contraction consumes the
        fused kernel's native TRANSPOSED (norb, M) layout directly —
        r[m] = sum_j mo_t[j, m] * icol[j, m] with the inverse columns
        broadcast per point — skipping the (norb, M) -> (ne, nc, nq, norb)
        relayout, which profiling measured at ~3x the orbital kernel's own
        cost (~187 us/step of copies at 8% of HBM peak on the H2O block)."""
        ne, nc, nq, _ = aux.shape
        exp = self.expansion
        single = (
            len(exp.map_up) == 1
            and exp.occ_up.shape[0] == 1
            and exp.occ_dn.shape[0] == 1
            and hasattr(self.orbitals, "eval_mo_t")
        )
        if single and es is None:
            mo_t = self.orbitals.eval_mo_t(params, aux.reshape(-1, 3))
            norb_up = self.orbitals.norb[0]
            outs = []
            for s, (inv, occ, n_s, off) in enumerate((
                (state.inv_up, exp.occ_up[0], self.nup, 0),
                (state.inv_dn, exp.occ_dn[0], self.ndn, norb_up),
            )):
                if n_s == 0:
                    continue
                Ms = n_s * nc * nq
                start = 0 if s == 0 else self.nup * nc * nq
                sel = mo_t[jnp.asarray(occ) + off, start:start + Ms]  # (n, Ms)
                # icol[e, c, j] = inv[c, 0, j, e] -> (j, e*c) -> +q axis
                icol = jnp.transpose(inv[:, 0], (1, 2, 0))  # (j, row, c)
                icol = icol.reshape(n_s, n_s * nc)[:, :, None]
                icol = jnp.broadcast_to(icol, (n_s, n_s * nc, nq)).reshape(
                    n_s, Ms
                )
                outs.append(jnp.sum(sel * icol, axis=0).reshape(n_s, nc, nq))
            return jnp.concatenate(outs, axis=0)
        if single:
            # static electron subset: one flat orbital pass, then per-spin
            # contractions with static row/column gathers
            es_np = np.asarray(es, dtype=np.int64)
            mo_t = self.orbitals.eval_mo_t(params, aux.reshape(-1, 3))
            norb_up = self.orbitals.norb[0]
            mo_r = mo_t.reshape(-1, ne, nc, nq)  # (norb_tot, ne, nc, nq)
            outs, order = [], []
            for s, (inv, occ, n_s, off, base) in enumerate((
                (state.inv_up, exp.occ_up[0], self.nup, 0, 0),
                (state.inv_dn, exp.occ_dn[0], self.ndn, norb_up, self.nup),
            )):
                idxs = [i for i, e in enumerate(es_np)
                        if (e < self.nup) == (s == 0)]
                if not idxs:
                    continue
                rows = np.asarray([int(es_np[i]) - base for i in idxs])
                sel = mo_r[jnp.asarray(np.asarray(occ) + off)][
                    :, jnp.asarray(idxs)
                ]  # (n_s, k, nc, nq)
                icol = inv[:, 0][:, :, jnp.asarray(rows)]  # (nc, n_s, k)
                outs.append(
                    jnp.einsum("jkcq,cjk->kcq", sel, icol)
                )
                order.extend(idxs)
            out = jnp.concatenate(outs, axis=0)
            return out[jnp.asarray(np.argsort(order))]
        mo_up, mo_dn = self.orbitals.eval(params, aux.reshape(-1, 3), 0)
        mo_up = mo_up.reshape(ne, nc, nq, -1)
        mo_dn = mo_dn.reshape(ne, nc, nq, -1)
        es_arr = jnp.arange(ne) if es is None else jnp.asarray(
            np.asarray(es)
        )
        return jax.vmap(
            lambda e, mu, md: self._ratio_terms(params, state, e, mu, md)
        )(es_arr, mo_up, mo_dn)

    def testvalue_many(self, params, state, epos):
        """Ratios for replacing EACH electron with epos (nconf, 3) one at a
        time: returns (nconf, nelec) (wf protocol testvalue_many,
        slater.py:301-388 semantics; used by OBDM/S^2 estimators)."""
        mo_up, mo_dn = self.orbitals.eval(params, epos, 0)  # (nconf, norb_s)
        w, denom, _ = self._expansion_weights(params, state)
        mu = jnp.asarray(self.expansion.map_up)
        md = jnp.asarray(self.expansion.map_dn)
        outs = []
        for mo, inv, occ, mp in (
            (mo_up, state.inv_up, self.expansion.occ_up, mu),
            (mo_dn, state.inv_dn, self.expansion.occ_dn, md),
        ):
            nd, n = occ.shape
            if n == 0:
                continue
            occf = jnp.asarray(occ.reshape(-1))
            sel = mo[:, occf].reshape(mo.shape[0], nd, n)
            r = jnp.einsum("ckj,ckjr->ckr", sel, inv)  # (nconf, nd, nrows)
            num = jnp.einsum("cdr,cd->cr", r[:, mp, :], w)
            outs.append(num / denom[:, None])
        return jnp.concatenate(outs, axis=1)

    def gradient_value(self, params, state, e, epos):
        """(grad psi/psi at epos (nconf,3), ratio (nconf,), saved).

        Value and gradient ratios come from ONE _ratio_terms call on a
        4-slot [value; grad] stack — the latency-bound Metropolis sweep pays
        per-kernel, so halving the det-ratio contraction count is a direct
        throughput win (one fusion chain instead of two)."""
        mo_up, mo_dn, gmo_up, gmo_dn = self.orbitals.eval(params, epos, 1)
        m4u = jnp.concatenate([mo_up[:, None, :], gmo_up], axis=1)
        m4d = jnp.concatenate([mo_dn[:, None, :], gmo_dn], axis=1)
        r = self._ratio_terms(params, state, e, m4u, m4d)  # (nconf, 4)
        ratio = r[:, 0]
        grad = r[:, 1:4] / r[:, 0:1]
        saved = {"mo_up": mo_up, "mo_dn": mo_dn,
                 "gmo_up": gmo_up, "gmo_dn": gmo_dn}
        return grad, ratio, saved

    def gradient(self, params, state, e, epos):
        g, _, _ = self.gradient_value(params, state, e, epos)
        return g

    def gradient_current(self, params, state, e, epos=None):
        """grad log psi of electron e at its CURRENT position, read from the
        state's orbital cache — a det-ratio contraction, no AO evaluation.
        `epos` (electron e's current position) is accepted for protocol
        uniformity and unused. Equals gradient(params, state, e, positions
        [:, e]) to cache/Sherman-Morrison rounding."""
        _, row_up, row_dn = self._spin_row(e)
        # _ratio_terms statically ignores the empty-spin array (nup==0 or
        # ndn==0), so None is safe there
        mo4_up = state.mog_up[:, row_up] if self.nup > 0 else None
        mo4_dn = state.mog_dn[:, row_dn] if self.ndn > 0 else None
        r = self._ratio_terms(params, state, e, mo4_up, mo4_dn)  # (nconf, 4)
        return r[:, 1:4] / r[:, 0:1]

    def move_begin(self, params, state, e, epos):
        """Metropolis move protocol, first half: gradient at the CURRENT
        position (from the orbital cache — no AO evaluation) plus an opaque
        aux threaded into move_finish. See method/vmc.py sweep."""
        return self.gradient_current(params, state, e, epos), None

    def move_finish(self, params, state, e, epos, aux):
        """Metropolis move protocol, second half: (grad_new, ratio, saved)
        at the proposed position."""
        return self.gradient_value(params, state, e, epos)

    def gradient_value_pair(self, params, state, e, epos_old, epos_new):
        """Fused old/new evaluation for the Metropolis sweep: one AO pass
        for (grad at old pos, grad at new pos, ratio new/current, saved).

        Halves the dominant per-move kernel cost vs calling gradient() and
        gradient_value() separately (the reference evaluates twice,
        mc.py:112-124).
        """
        X = jnp.stack([epos_old, epos_new], axis=1)  # (c, 2, 3)
        mo_up, mo_dn, gmo_up, gmo_dn = self.orbitals.eval(params, X, 1)
        nconf = X.shape[0]
        r = self._ratio_terms(params, state, e, mo_up, mo_dn)  # (c, 2)
        gfu = gmo_up.reshape(nconf, 6, -1)
        gfd = gmo_dn.reshape(nconf, 6, -1)
        gr = self._ratio_terms(params, state, e, gfu, gfd).reshape(nconf, 2, 3)
        grad_old = gr[:, 0] / r[:, 0, None]
        grad_new = gr[:, 1] / r[:, 1, None]
        ratio = r[:, 1] / r[:, 0]
        saved = {"mo_up": mo_up[:, 1], "mo_dn": mo_dn[:, 1],
                 "gmo_up": gmo_up[:, 1], "gmo_dn": gmo_dn[:, 1]}
        return grad_old, grad_new, ratio, saved

    def gradient_laplacian(self, params, state, e, epos):
        """(grad psi/psi, lap psi/psi) both at epos.

        Kept as THREE separate _ratio_terms contractions: an A/B on the
        ccECP H2O block (long-block min-of-means) showed a fused 5-slot
        [value; grad; lap] stack makes the kinetic sweep ~10% SLOWER — the
        concatenates break XLA's fusion of the per-slot contraction with
        the orbital evaluation it consumes."""
        mo_up, mo_dn, gmo_up, gmo_dn, lmo_up, lmo_dn = self.orbitals.eval(
            params, epos, 2
        )
        ratio = self._ratio_terms(params, state, e, mo_up, mo_dn)
        gratio = self._ratio_terms(params, state, e, gmo_up, gmo_dn)
        lratio = self._ratio_terms(params, state, e, lmo_up, lmo_dn)
        return gratio / ratio[:, None], lratio / ratio

    def updateinternals(self, params, state, e, epos, mask, saved):
        """Sherman-Morrison update after an accepted single-electron move.

        Also maintains the per-electron orbital value/gradient cache
        (gradient_current). If `saved` came from gradient_value(_pair) it
        already carries the new position's MO gradients; a testvalue-only
        `saved` (e.g. heat-bath T-moves) triggers one AO re-evaluation here
        — callers on hot paths should move electrons through
        gradient_value so the cache update is free."""
        pred, row_up, row_dn = self._spin_row(e)

        if "gmo_up" in saved:
            cmo_up, cmo_dn = saved["mo_up"], saved["mo_dn"]
            cgmo_up, cgmo_dn = saved["gmo_up"], saved["gmo_dn"]
        else:
            cmo_up, cmo_dn, cgmo_up, cgmo_dn = self.orbitals.eval(
                params, epos, 1
            )
        new4_up = jnp.concatenate([cmo_up[:, None, :], cgmo_up], axis=1)
        new4_dn = jnp.concatenate([cmo_dn[:, None, :], cgmo_dn], axis=1)

        def upd(inv, phase, logdet, occ, mo_new, row):
            nd, n = occ.shape
            occf = jnp.asarray(occ.reshape(-1))
            rows = mo_new[:, occf].reshape(mo_new.shape[0], nd, n)
            ratio, inv_new = sherman_morrison_row(inv, rows, row)
            absr = jnp.abs(ratio)
            safe = jnp.where(absr == 0, 1.0, absr)
            phase_new = phase * ratio / safe
            logdet_new = logdet + jnp.log(safe)
            return ratio, inv_new, phase_new, logdet_new

        def up_branch(st):
            _, inv_new, ph, ld = upd(
                st.inv_up, st.phase_up, st.logdet_up,
                self.expansion.occ_up, saved["mo_up"], row_up,
            )
            m = mask[:, None]
            row = jnp.where(
                mask[:, None, None], new4_up, st.mog_up[:, row_up]
            )
            return st._replace(
                inv_up=jnp.where(m[..., None, None], inv_new, st.inv_up),
                phase_up=jnp.where(m, ph, st.phase_up),
                logdet_up=jnp.where(m, ld, st.logdet_up),
                mog_up=st.mog_up.at[:, row_up].set(row),
            )

        def dn_branch(st):
            _, inv_new, ph, ld = upd(
                st.inv_dn, st.phase_dn, st.logdet_dn,
                self.expansion.occ_dn, saved["mo_dn"], row_dn,
            )
            m = mask[:, None]
            row = jnp.where(
                mask[:, None, None], new4_dn, st.mog_dn[:, row_dn]
            )
            return st._replace(
                inv_dn=jnp.where(m[..., None, None], inv_new, st.inv_dn),
                phase_dn=jnp.where(m, ph, st.phase_dn),
                logdet_dn=jnp.where(m, ld, st.logdet_dn),
                mog_dn=st.mog_dn.at[:, row_dn].set(row),
            )

        if self.ndn == 0:
            return up_branch(state)
        if self.nup == 0:
            return dn_branch(state)
        return jax.lax.cond(pred, up_branch, dn_branch, state)

    def _pgradient_kpoint(self, params, positions, state, w, denom):
        """Orbital-coefficient gradients for KPointOrbitals.

        Same tr(M^-1 dM) machinery as the molecular case, per k block. For
        complex coefficients returns the holomorphic d log psi / dC
        (LinearTransform splits it into the re/im real directions).
        """
        kaos = self.orbitals._kaos(positions, 0)[0]  # (c, ne, nk, nao)
        mu = jnp.asarray(self.expansion.map_up)
        md = jnp.asarray(self.expansion.map_dn)
        offs = {}
        out = {}
        for spin, (inv, occ, mp, sl, cname) in enumerate((
            (state.inv_up, self.expansion.occ_up, mu, slice(0, self.nup),
             "mo_coeff_alpha"),
            (state.inv_dn, self.expansion.occ_dn, md, slice(self.nup, None),
             "mo_coeff_beta"),
        )):
            blocks = params[cname]
            nd, n = occ.shape
            if n == 0:
                out[cname] = [
                    jnp.zeros((positions.shape[0],) + b.shape, b.dtype)
                    for b in blocks
                ]
                continue
            sel = (mp[:, None] == jnp.arange(nd)[None, :]).astype(w.dtype)
            wk = (w @ sel) / denom[:, None]  # (c, nd)
            occf = jnp.asarray(occ)  # (nd, n)
            grads = []
            off = 0
            for k, b in enumerate(blocks):
                nocc_k = b.shape[1]
                ao_k = kaos[:, sl, k, :]  # (c, n_s, nao)
                # t[c, d, j, mu] = sum_i inv[c,d,j,i] ao_k[c,i,mu]
                t = jnp.einsum("ckji,cim->ckjm", inv, ao_k)
                onehot = (
                    occf[..., None] == (off + jnp.arange(nocc_k))
                ).astype(w.dtype)  # (nd, n, nocc_k)
                dC = jnp.einsum("ck,ckjm,kjo->cmo", wk, t, onehot)
                grads.append(dC)
                off += nocc_k
            out[cname] = grads
        return out

    def pgradient(self, params, positions):
        """d log psi / d params, per walker (pytree of (nconf, ...)).

        Analytic (slater.py:462-542 semantics): determinant-coefficient
        derivatives from the expansion weights, orbital-coefficient
        derivatives via tr(M^-1 dM). Closed-form einsums — no autodiff
        graph over the determinant solver (a vmap-of-jacobian formulation
        compiles pathologically on TPU).
        """
        state = self.recompute(params, positions)
        w, denom, _ = self._expansion_weights(params, state)  # (c, ndet)
        # det_coeff: d log psi / d c_d = (w_d / c_d) / denom
        # holomorphic d log psi / dc: complex for a complex wavefunction
        # even when det_coeff itself is real — the imaginary (phase) part
        # feeds the complex-channel SR gradient <E_I Im O>
        # (observables/sr.py docstring); real wavefunctions produce real
        # dtype here so nothing changes on the common path.
        dDet = (w / params["det_coeff"][None, :]) / denom[:, None]
        out = {"det_coeff": dDet}

        if not isinstance(self.orbitals, MolecularOrbitals):
            out.update(self._pgradient_kpoint(params, positions, state, w, denom))
            return out

        from ..ops.gto import eval_gto

        ao = eval_gto(self.orbitals.spec, positions, 0)  # (c, ne, nao)
        mu = jnp.asarray(self.expansion.map_up)
        md = jnp.asarray(self.expansion.map_dn)
        # per-unique-det weights: sum over expansion terms referring to det k
        for spin, (inv, occ, mp, sl, cname) in enumerate((
            (state.inv_up, self.expansion.occ_up, mu, slice(0, self.nup),
             "mo_coeff_alpha"),
            (state.inv_dn, self.expansion.occ_dn, md, slice(self.nup, None),
             "mo_coeff_beta"),
        )):
            norb = params[cname].shape[1]
            nd, n = occ.shape
            if n == 0:
                out[cname] = jnp.zeros(
                    (positions.shape[0],) + params[cname].shape
                )
                continue
            # weight of unique det k: sum_d w_d [map(d) = k] / denom
            sel = (mp[:, None] == jnp.arange(nd)[None, :]).astype(w.dtype)
            wk = (w @ sel) / denom[:, None]  # (c, nd)
            # t[c, k, j, mu] = sum_i inv[c,k,j,i] ao_s[c,i,mu]
            t = jnp.einsum("ckji,cim->ckjm", inv, ao[:, sl])
            # scatter column j of det k onto orbital occ[k, j]
            occf = jnp.asarray(occ)  # (nd, n)
            onehot = (occf[..., None] == jnp.arange(norb)).astype(w.dtype)
            dC = jnp.einsum("ck,ckjm,kjo->cmo", wk, t, onehot)
            # holomorphic d log psi / dC (the re/im optimization split
            # happens in LinearTransform); real orbitals give real dtype
            out[cname] = dC
        return out
