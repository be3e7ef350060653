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
    def __init__(self, mol, orb_coeff, spin=(0, 1), aux_sigma=1.5):
        self.spec = GTOSpec.from_molecule(mol)
        self.orb_coeff = np.asarray(orb_coeff)
        self.nup, self.ndn = mol.nelec
        self.spin = spin
        self.mixture = GaussianMixture(mol.atom_coords, aux_sigma)

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

        def body_e1(e1i, acc):
            e1 = lo1 + e1i
            ratio1, saved1 = wf.testvalue(params, state, e1, r1)
            st1 = wf.updateinternals(params, state, e1, r1, ones, saved1)
            ratios2 = wf.testvalue_many(params, st1, r2)  # (c, ne)
            sel = ratios2[:, lo2:hi2]
            notself = (jnp.arange(lo2, hi2) != e1).astype(dtype)
            # pair weight for each e2: ratio1 * ratio2(e2)
            w = ratio1[:, None] * sel * notself[None, :]
            contrib = jnp.einsum(
                "ce,ci,cj,ck,cel->cijkl",
                w, jnp.conj(phi1), jnp.conj(phi2),
                phie[:, e1, :],
                phie[:, lo2:hi2, :],
            )
            return acc + contrib

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
        n = self.orb_coeff.shape[1]
        return {"value": (n, n, n, n)}
