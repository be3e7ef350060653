"""2D-periodic (slab) Ewald summation, Yeh-Berkowitz / Parry form
(port of pyqmc/observables/ewald2d.py:25-327).

For a cell periodic in the xy-plane (lattice rows 0,1; z open):

  psi(r) = sum_L erfc(a|r+L|)/|r+L|
         + (pi/Area) sum_{G!=0} (1/G) [ e^{G z} erfc(a z + G/2a)
                                      + e^{-G z} erfc(-a z + G/2a) ] cos(G.rho)
         - (2 sqrt(pi)/Area) [ e^{-a^2 z^2}/a + sqrt(pi) z erf(a z) ]

  xi = lim_{r->0} (psi - 1/r)
     = sum_{L!=0} erfc(a|L|)/|L| + sum_G w_G(0) - 2 sqrt(pi)/(a Area)
       - 2 a/sqrt(pi)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erfc as jerfc
from scipy.special import erfc as np_erfc, erf as np_erf


def _gpoints_2d(lat2, alpha, tol=1e-10):
    recip = 2.0 * np.pi * np.linalg.inv(lat2).T  # (2,2) rows
    gmax = 2.0 * alpha * np.sqrt(-np.log(tol))
    bh = 1.0 / np.linalg.norm(np.linalg.inv(recip), axis=0)
    nm = np.maximum(1, np.ceil(gmax / bh).astype(int))
    rngs = [np.arange(-n, n + 1) for n in nm]
    pts = np.array(np.meshgrid(*rngs, indexing="ij")).reshape(2, -1).T
    keep = []
    for n in pts:
        if n[0] > 0 or (n[0] == 0 and n[1] > 0):
            keep.append(n)
    G = np.array(keep) @ recip
    Gn = np.linalg.norm(G, axis=1)
    sel = np_erfc(Gn / (2 * alpha)) / Gn > tol * 1e-3
    return G[sel], Gn[sel]


def _images_2d(lat2, alpha, tol=1e-10):
    rcut = np.sqrt(-np.log(tol)) / alpha
    h = 1.0 / np.linalg.norm(np.linalg.inv(lat2), axis=0)
    nm = np.maximum(1, np.ceil((rcut + np.linalg.norm(lat2.sum(0))) / h).astype(int))
    rngs = [np.arange(-n, n + 1) for n in nm]
    pts = np.array(np.meshgrid(*rngs, indexing="ij")).reshape(2, -1).T
    L = pts @ lat2
    return np.concatenate([L, np.zeros((len(L), 1))], axis=1)


class Ewald2D:
    """Slab Coulomb for cells periodic in rows 0 and 1 of the lattice."""

    def __init__(self, cell, alpha=None, tol=1e-10):
        lat2 = np.asarray(cell.lattice)[:2, :2]
        self.area = abs(np.linalg.det(lat2))
        h = 1.0 / np.linalg.norm(np.linalg.inv(lat2), axis=0)
        self.alpha = alpha if alpha is not None else 5.0 / min(h)
        self.gpoints, self.gnorms = _gpoints_2d(lat2, self.alpha, tol)
        self.images = _images_2d(lat2, self.alpha, tol)
        a, A = self.alpha, self.area
        Ln = np.linalg.norm(self.images, axis=1)
        nz = Ln > 1e-12
        # w_G(z=0) (x2 for half-space)
        wg0 = 2.0 * (np.pi / A) * (2.0 * np_erfc(self.gnorms / (2 * a)) / self.gnorms)
        self.xi = (
            float(np.sum(np_erfc(a * Ln[nz]) / Ln[nz]))
            + float(np.sum(wg0))
            - 2.0 * np.sqrt(np.pi) / (a * A)
            - 2.0 * a / np.sqrt(np.pi)
        )
        self.atom_coords = np.asarray(cell.atom_coords)
        self.atom_charges = np.asarray(cell.atom_charges, dtype=np.float64)
        self.ii_const = self._ion_ion()

    def psi_host(self, r):
        r = np.asarray(r, dtype=np.float64).reshape(-1, 3)
        a, A = self.alpha, self.area
        d = r[:, None, :] + self.images[None]
        dn = np.linalg.norm(d, axis=-1)
        real = np.sum(np_erfc(a * dn) / dn, axis=1)
        z = r[:, 2]
        rho = r[:, :2]
        G = self.gpoints
        Gn = self.gnorms
        zz = z[:, None]
        f = (
            np.exp(Gn[None] * zz) * np_erfc(a * zz + Gn[None] / (2 * a))
            + np.exp(-Gn[None] * zz) * np_erfc(-a * zz + Gn[None] / (2 * a))
        )
        rec = 2.0 * (np.pi / A) * np.sum(np.cos(rho @ G.T) * f / Gn[None], axis=1)
        g0 = -(2.0 * np.sqrt(np.pi) / A) * (
            np.exp(-(a * z) ** 2) / a + np.sqrt(np.pi) * z * np_erf(a * z)
        )
        return real + rec + g0

    def _ion_ion(self):
        n = len(self.atom_charges)
        e = 0.5 * np.sum(self.atom_charges**2) * self.xi
        for i in range(n):
            for j in range(i + 1, n):
                e += (
                    self.atom_charges[i]
                    * self.atom_charges[j]
                    * self.psi_host(self.atom_coords[i] - self.atom_coords[j])[0]
                )
        return float(e)

    def _psi_dev(self, r):
        """Device psi for displacement vectors r (..., 3)."""
        dtype = r.dtype
        a = self.alpha
        A = self.area
        d = r[..., None, :] + jnp.asarray(self.images, dtype)
        dn = jnp.sqrt(jnp.sum(d * d, axis=-1))
        real = jnp.sum(jerfc(a * dn) / dn, axis=-1)
        z = r[..., 2]
        G = jnp.asarray(self.gpoints, dtype)
        Gn = jnp.asarray(self.gnorms, dtype)
        zz = z[..., None]
        f = jnp.exp(Gn * zz) * jerfc(a * zz + Gn / (2 * a)) + jnp.exp(
            -Gn * zz
        ) * jerfc(-a * zz + Gn / (2 * a))
        cosg = jnp.cos(jnp.einsum("...x,gx->...g", r[..., :2], G))
        rec = 2.0 * (np.pi / A) * jnp.sum(cosg * f / Gn, axis=-1)
        g0 = -(2.0 * np.sqrt(np.pi) / A) * (
            jnp.exp(-((a * z) ** 2)) / a
            + np.sqrt(np.pi) * z * jax.scipy.special.erf(a * z)
        )
        return real + rec + g0

    def energy(self, positions):
        """(ee, ei, ii) per walker for positions (nconf, ne, 3)."""
        dtype = positions.dtype
        nconf, ne = positions.shape[:2]
        iu = jnp.triu_indices(ne, k=1)
        d = positions[:, :, None, :] - positions[:, None, :, :]
        ee = jnp.sum(self._psi_dev(d[:, iu[0], iu[1], :]), axis=-1) if ne > 1 else jnp.zeros(nconf, dtype)
        ee = ee + 0.5 * ne * self.xi
        dei = positions[:, :, None, :] - jnp.asarray(self.atom_coords, dtype)[None, None]
        ei = -jnp.einsum(
            "I,cnI->c", jnp.asarray(self.atom_charges, dtype), self._psi_dev(dei)
        )
        ii = jnp.full(nconf, self.ii_const, dtype)
        return ee, ei, ii
