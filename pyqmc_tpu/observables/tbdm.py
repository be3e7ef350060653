"""Two-body density matrix accumulator (port of pyqmc/observables/tbdm.py,
estimator of DOI:10.1063/1.4793531 Eq. 10).

  rho2_{ijkl}^{s1 s2} = < sum_{e1 in s1, e2 in s2, e1 != e2}
        phi_i*(r1') phi_j*(r2') phi_k(r_e1) phi_l(r_e2)
        Psi(e1->r1', e2->r2')/Psi / (q(r1') q(r2')) >

Two auxiliary points from the analytic mixture q (see obdm.py). The
two-electron replacement ratio factorizes into a single-electron ratio and a
second ratio on the once-updated scratch state; the e1 loop is a
lax.fori_loop, e2 is vectorized via testvalue_many.
"""

import jax
import jax.numpy as jnp

from .obdm import GaussianMixture
from ..ops.gto import GTOSpec, eval_gto

import numpy as np


class TBDMAccumulator:
    def __init__(self, mol, orb_coeff, spin=(0, 1), aux_sigma=1.5,
                 ijkl=None):
        """ijkl: optional (nsel, 4) integer array selecting which matrix
        elements to accumulate (reference tbdm.py:112-121) — bounds the
        otherwise norb^4 output; None keeps the full tensor."""
        self.spec = GTOSpec.from_molecule(mol)
        self.orb_coeff = np.asarray(orb_coeff)
        self.nup, self.ndn = mol.nelec
        self.spin = spin
        self.mixture = GaussianMixture(mol.atom_coords, aux_sigma)
        self.ijkl = None if ijkl is None else np.asarray(ijkl, dtype=np.int32)

    def _orbs(self, X):
        return eval_gto(self.spec, X, 0) @ jnp.asarray(self.orb_coeff, X.dtype)

    def _slice(self, s):
        return (0, self.nup) if s == 0 else (self.nup, self.nup + self.ndn)

    def __call__(self, wf, params, state, positions, key):
        nconf = positions.shape[0]
        dtype = positions.dtype
        k1, k2 = jax.random.split(key)
        r1 = self.mixture.sample(k1, nconf, dtype)
        r2 = self.mixture.sample(k2, nconf, dtype)
        q1 = self.mixture.density(r1)
        q2 = self.mixture.density(r2)
        phi1 = self._orbs(r1)  # (c, no)
        phi2 = self._orbs(r2)
        phie = self._orbs(positions)  # (c, ne, no)
        lo1, hi1 = self._slice(self.spin[0])
        lo2, hi2 = self._slice(self.spin[1])
        norb = self.orb_coeff.shape[1]
        ones = jnp.ones(nconf, dtype=bool)

        sel_ijkl = self.ijkl

        def body_e1(e1i, acc):
            e1 = lo1 + e1i
            ratio1, saved1 = wf.testvalue(params, state, e1, r1)
            st1 = wf.updateinternals(params, state, e1, r1, ones, saved1)
            ratios2 = wf.testvalue_many(params, st1, r2)  # (c, ne)
            sel = ratios2[:, lo2:hi2]
            notself = (jnp.arange(lo2, hi2) != e1).astype(dtype)
            # pair weight for each e2: ratio1 * ratio2(e2)
            w = ratio1[:, None] * sel * notself[None, :]
            if sel_ijkl is not None:
                ii, jj, kk, ll = (jnp.asarray(sel_ijkl[:, c]) for c in range(4))
                contrib = jnp.einsum(
                    "cs,cs,cs,ces,ce->cs",
                    jnp.conj(phi1[:, ii]), jnp.conj(phi2[:, jj]),
                    phie[:, e1, :][:, kk], phie[:, lo2:hi2, :][:, :, ll], w,
                )
            else:
                contrib = jnp.einsum(
                    "ce,ci,cj,ck,cel->cijkl",
                    w, jnp.conj(phi1), jnp.conj(phi2),
                    phie[:, e1, :],
                    phie[:, lo2:hi2, :],
                )
            return acc + contrib

        if sel_ijkl is not None:
            acc0 = jnp.zeros((nconf, len(sel_ijkl)), dtype=phie.dtype)
            out = jax.lax.fori_loop(0, hi1 - lo1, body_e1, acc0)
            return {"value": out / (q1 * q2)[:, None]}
        acc0 = jnp.zeros((nconf, norb, norb, norb, norb),
                         dtype=phie.dtype)
        out = jax.lax.fori_loop(0, hi1 - lo1, body_e1, acc0)
        return {"value": out / (q1 * q2)[:, None, None, None, None]}

    def avg(self, wf, params, state, positions, key=None):
        dat = self(wf, params, state, positions, key)
        return {k: jnp.mean(v, axis=0) for k, v in dat.items()}

    def keys(self):
        return {"value"}

    def shapes(self):
        if self.ijkl is not None:
            return {"value": (len(self.ijkl),)}
        n = self.orb_coeff.shape[1]
        return {"value": (n, n, n, n)}


class KTBDMAccumulator:
    """Two-body density matrix for PERIODIC cells in the k-point MO basis
    (periodic analogue of TBDMAccumulator above; parity with the
    reference's PBC-capable TBDM, tbdm.py:124-181 which reuses the k-point
    orbital evaluator).

    Same DOI:10.1063/1.4793531 Eq. 10 estimator, with both auxiliary
    points drawn from the wrapped atom-centered mixture (exact image-sum
    density, see obdm.PeriodicGaussianMixture). Works on the complex path
    and on the real-pair TPU tiers (ratio/orbital products composed in
    (re, im) pair arithmetic); always returns split real arrays
    {"value_re", "value_im"} of shape (nconf, n1, n2, n1, n2).

    spin: (s1, s2) spin sectors for (e1, e2).
    """

    def __init__(self, cell_or_supercell, orbitals, spin=(0, 1),
                 aux_sigma=1.5):
        from .obdm import PeriodicGaussianMixture

        self.orbitals = orbitals
        self.nup, self.ndn = cell_or_supercell.nelec
        self.spin = spin
        self.mixture = PeriodicGaussianMixture(cell_or_supercell, aux_sigma)
        self.norb = (orbitals.norb[spin[0]], orbitals.norb[spin[1]])

    def _slice(self, s):
        return (0, self.nup) if s == 0 else (self.nup, self.nup + self.ndn)

    def __call__(self, wf, params, state, positions, key):
        nconf = positions.shape[0]
        dtype = positions.dtype
        k1, k2 = jax.random.split(key)
        r1, q1 = self.mixture.sample(k1, nconf, dtype)
        r2, q2 = self.mixture.sample(k2, nconf, dtype)
        lo1, hi1 = self._slice(self.spin[0])
        lo2, hi2 = self._slice(self.spin[1])
        s1, s2 = self.spin
        n1, n2 = self.norb
        ones = jnp.ones(nconf, dtype=bool)
        qinv = 1.0 / (q1 * q2)

        if getattr(wf, "ratio_is_modulus", False):
            pa1 = self.orbitals.eval_pair(params, r1, 0)
            pa2 = self.orbitals.eval_pair(params, r2, 0)
            pe = self.orbitals.eval_pair(params, positions, 0)
            p1r, p1i = pa1[2 * s1], pa1[2 * s1 + 1]  # (c, n1)
            p2r, p2i = pa2[2 * s2], pa2[2 * s2 + 1]  # (c, n2)
            e1r, e1i = pe[2 * s1], pe[2 * s1 + 1]  # (c, ne, n1)
            e2r, e2i = pe[2 * s2][:, lo2:hi2], pe[2 * s2 + 1][:, lo2:hi2]

            def body_e1(e1idx, acc):
                e1 = lo1 + e1idx
                r1r, r1i, saved1 = wf.testvalue_pair(params, state, e1, r1)
                st1 = wf.updateinternals(params, state, e1, r1, ones, saved1)
                rr2, ri2 = wf.testvalue_many_pair(params, st1, r2)
                selr, seli = rr2[:, lo2:hi2], ri2[:, lo2:hi2]
                ns = (jnp.arange(lo2, hi2) != e1).astype(dtype)[None, :]
                # pair weight w_e2 = r1 * r2(e2)
                wr = (r1r[:, None] * selr - r1i[:, None] * seli) * ns
                wi = (r1r[:, None] * seli + r1i[:, None] * selr) * ns
                # P_cik = conj(phi1)_i * phi(r_e1)_k
                ekr = e1r[:, e1, :]
                eki = e1i[:, e1, :]
                Pr = jnp.einsum("ci,ck->cik", p1r, ekr) + jnp.einsum(
                    "ci,ck->cik", p1i, eki
                )
                Pi = jnp.einsum("ci,ck->cik", p1r, eki) - jnp.einsum(
                    "ci,ck->cik", p1i, ekr
                )
                # Qs_cjl = sum_e2 w_e2 * conj(phi2)_j * phi(r_e2)_l
                W2r = jnp.einsum("ce,cj->cej", wr, p2r) + jnp.einsum(
                    "ce,cj->cej", wi, p2i
                )
                W2i = jnp.einsum("ce,cj->cej", wi, p2r) - jnp.einsum(
                    "ce,cj->cej", wr, p2i
                )
                Qsr = jnp.einsum("cej,cel->cjl", W2r, e2r) - jnp.einsum(
                    "cej,cel->cjl", W2i, e2i
                )
                Qsi = jnp.einsum("cej,cel->cjl", W2r, e2i) + jnp.einsum(
                    "cej,cel->cjl", W2i, e2r
                )
                accr, acci = acc
                return (
                    accr
                    + jnp.einsum("cik,cjl->cijkl", Pr, Qsr)
                    - jnp.einsum("cik,cjl->cijkl", Pi, Qsi),
                    acci
                    + jnp.einsum("cik,cjl->cijkl", Pr, Qsi)
                    + jnp.einsum("cik,cjl->cijkl", Pi, Qsr),
                )

            z = jnp.zeros((nconf, n1, n2, n1, n2), dtype)
            vr, vi = jax.lax.fori_loop(0, hi1 - lo1, body_e1, (z, z))
            return {
                "value_re": vr * qinv[:, None, None, None, None],
                "value_im": vi * qinv[:, None, None, None, None],
            }

        phi1 = self.orbitals.eval(params, r1, 0)[s1]
        phi2 = self.orbitals.eval(params, r2, 0)[s2]
        phie1 = self.orbitals.eval(params, positions, 0)[s1]
        phie2 = self.orbitals.eval(params, positions, 0)[s2][:, lo2:hi2]

        def body_e1(e1idx, acc):
            e1 = lo1 + e1idx
            ratio1, saved1 = wf.testvalue(params, state, e1, r1)
            st1 = wf.updateinternals(params, state, e1, r1, ones, saved1)
            ratios2 = wf.testvalue_many(params, st1, r2)
            sel = ratios2[:, lo2:hi2]
            ns = (jnp.arange(lo2, hi2) != e1).astype(dtype)
            w = ratio1[:, None] * sel * ns[None, :]
            return acc + jnp.einsum(
                "ce,ci,cj,ck,cel->cijkl",
                w, jnp.conj(phi1), jnp.conj(phi2),
                phie1[:, e1, :], phie2,
            )

        z = jnp.zeros((nconf, n1, n2, n1, n2), dtype=phie1.dtype)
        out = jax.lax.fori_loop(0, hi1 - lo1, body_e1, z)
        out = out * qinv[:, None, None, None, None]
        return {"value_re": jnp.real(out), "value_im": jnp.imag(out)}

    def avg(self, wf, params, state, positions, key=None):
        dat = self(wf, params, state, positions, key)
        return {k: jnp.mean(v, axis=0) for k, v in dat.items()}

    def keys(self):
        return {"value_re", "value_im"}

    def shapes(self):
        n1, n2 = self.norb
        return {"value_re": (n1, n2, n1, n2), "value_im": (n1, n2, n1, n2)}
