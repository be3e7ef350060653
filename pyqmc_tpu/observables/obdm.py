"""One-body density matrix accumulator.

Redesign of pyqmc/observables/obdm.py:120-247. The reference runs a separate
Metropolis chain on f(r) = sum_i |phi_i|^2 for the auxiliary coordinate
(obdm.py:213-243), which is stateful and host-driven. Here the auxiliary
point is drawn from an *analytic* atom-centered Gaussian-mixture density q
(counter-based key, stateless, jit-safe); the estimator divides by q, so it
is unbiased for any q > 0 — f-sampling is only a variance optimization.

  rho_ij = < sum_e phi_i*(r') phi_j(r_e) Psi(r_e -> r')/Psi / q(r') >
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.gto import GTOSpec, eval_gto


class GaussianMixture:
    """Atom-centered isotropic Gaussian mixture for auxiliary sampling."""

    def __init__(self, atom_coords, sigma=1.5):
        self.centers = np.asarray(atom_coords)
        self.sigma = sigma

    def sample(self, key, n, dtype):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (n,), 0, len(self.centers))
        mu = jnp.asarray(self.centers, dtype)[idx]
        return mu + self.sigma * jax.random.normal(k2, (n, 3), dtype)

    def density(self, X):
        d = X[:, None, :] - jnp.asarray(self.centers, X.dtype)[None]
        r2 = jnp.sum(d * d, axis=-1)
        norm = (2 * np.pi * self.sigma**2) ** -1.5 / len(self.centers)
        return norm * jnp.sum(jnp.exp(-r2 / (2 * self.sigma**2)), axis=1)


class OBDMAccumulator:
    """rho_ij in the basis of `orb_coeff` columns (spin-summed or per spin).

    spin: None (sum), 0 (up electrons), or 1 (down).
    """

    def __init__(self, mol, orb_coeff, spin=None, aux_sigma=1.5):
        self.spec = GTOSpec.from_molecule(mol)
        self.orb_coeff = np.asarray(orb_coeff)
        self.nup, self.ndn = mol.nelec
        self.spin = spin
        self.mixture = GaussianMixture(mol.atom_coords, aux_sigma)

    def _orbs(self, X):
        return eval_gto(self.spec, X, 0) @ jnp.asarray(
            self.orb_coeff, X.real.dtype if jnp.iscomplexobj(X) else X.dtype
        )

    def _electron_slice(self):
        if self.spin is None:
            return 0, self.nup + self.ndn
        if self.spin == 0:
            return 0, self.nup
        return self.nup, self.nup + self.ndn

    def __call__(self, wf, params, state, positions, key):
        nconf = positions.shape[0]
        dtype = positions.dtype
        raux = self.mixture.sample(key, nconf, dtype)  # (nconf, 3)
        q = self.mixture.density(raux)
        phi_aux = self._orbs(raux)  # (nconf, norb)
        phi_e = self._orbs(positions)  # (nconf, nelec, norb)
        ratios = wf.testvalue_many(params, state, raux)  # (nconf, nelec)
        lo, hi = self._electron_slice()
        contrib = jnp.einsum(
            "ce,ci,cej->cij",
            ratios[:, lo:hi],
            jnp.conj(phi_aux),
            phi_e[:, lo:hi, :],
        )
        return {"value": contrib / q[:, None, None]}

    def avg(self, wf, params, state, positions, key=None):
        dat = self(wf, params, state, positions, key)
        return {k: jnp.mean(v, axis=0) for k, v in dat.items()}

    def keys(self):
        return {"value"}

    def shapes(self):
        n = self.orb_coeff.shape[1]
        return {"value": (n, n)}


def normalize_obdm(rho, norm=None):
    return np.asarray(rho)
