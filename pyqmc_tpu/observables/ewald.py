"""3D Ewald summation (replaces pyqmc/observables/ewald.py:21-398).

Decomposition used here (equivalent to the reference's ee/ei/ii split):

  psi(r) = sum_L erfc(a|r+L|)/|r+L| + sum_G w_G cos(G.r) - pi/(V a^2)
  xi     = sum_{L!=0} erfc(a|L|)/|L| + sum_G w_G - pi/(V a^2) - 2a/sqrt(pi)

  E_ee = sum_{i<j} psi(r_ij) + (ne/2) xi
  E_ii = sum_{I<J} Z_I Z_J psi(R_IJ) + (sum_I Z_I^2 / 2) xi   [precomputed]
  E_ei = - sum_{i,I} Z_I psi(r_iI)

with w_G = (4 pi / V) exp(-G^2/(4 a^2)) / G^2. Reciprocal sums are evaluated
through structure factors (one (nconf*ne, nG) matmul pair -> MXU), real-space
sums over a fixed image set (static shapes). alpha = 5 / min cell height
(ewald.py:134-135); G vectors kept while w_G > 1e-10 (ewald.py:372-377).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erfc


def _select_gpoints(lattice, alpha, tol=1e-10):
    recip = 2.0 * np.pi * np.linalg.inv(lattice).T  # rows
    volume = abs(np.linalg.det(lattice))
    # need |G| up to Gmax where exp(-G^2/4a^2) ~ tol
    gmax = 2.0 * alpha * np.sqrt(-np.log(tol))
    # per-direction count: distance between reciprocal planes
    bheights = 1.0 / np.linalg.norm(np.linalg.inv(recip), axis=0)
    nmaxs = np.maximum(1, np.ceil(gmax / bheights).astype(int))
    rngs = [np.arange(-n, n + 1) for n in nmaxs]
    pts = np.array(np.meshgrid(*rngs, indexing="ij")).reshape(3, -1).T
    # half space: first nonzero component positive
    keep = []
    for n in pts:
        if n[0] > 0 or (n[0] == 0 and (n[1] > 0 or (n[1] == 0 and n[2] > 0))):
            keep.append(n)
    G = np.array(keep) @ recip
    G2 = np.sum(G * G, axis=1)
    w = 2.0 * (4.0 * np.pi / volume) * np.exp(-G2 / (4 * alpha**2)) / G2
    sel = w > tol
    return G[sel], w[sel]


def _image_set(lattice, alpha, tol=1e-10):
    """Lattice translations needed for the erfc sum."""
    # erfc(a r) < tol  => r > ~ sqrt(-ln tol)/a; include enough image shells
    rcut = np.sqrt(-np.log(tol)) / alpha
    inv = np.linalg.inv(lattice)
    # number of cells needed along each direction
    heights = 1.0 / np.linalg.norm(inv, axis=0)
    nimg = np.maximum(1, np.ceil(rcut / heights).astype(int))
    rngs = [np.arange(-n, n + 1) for n in nimg]
    pts = np.array(np.meshgrid(*rngs, indexing="ij")).reshape(3, -1).T
    return pts @ lattice


class Ewald:
    def __init__(self, cell, alpha=None, gtol=1e-10):
        lattice = np.asarray(cell.lattice, dtype=np.float64)
        self.volume = abs(np.linalg.det(lattice))
        inv = np.linalg.inv(lattice)
        heights = 1.0 / np.linalg.norm(inv, axis=0)
        self.alpha = alpha if alpha is not None else 5.0 / np.min(heights)
        self.gpoints, self.gweights = _select_gpoints(lattice, self.alpha, gtol)
        self.images = _image_set(lattice, self.alpha)
        self.lattice = lattice

        a = self.alpha
        V = self.volume
        L = self.images
        Lnorm = np.linalg.norm(L, axis=1)
        nz = Lnorm > 1e-12
        from scipy.special import erfc as np_erfc

        self.xi = (
            float(np.sum(np_erfc(a * Lnorm[nz]) / Lnorm[nz]))
            + float(np.sum(self.gweights))
            - np.pi / (V * a * a)
            - 2.0 * a / np.sqrt(np.pi)
        )

        # ion constants (host, f64)
        self.atom_coords = np.asarray(cell.atom_coords)
        self.atom_charges = np.asarray(cell.atom_charges, dtype=np.float64)
        self.ii_const = self._ion_ion()
        # ion structure factor S_ion(G) as (nG,) complex
        phases = self.atom_coords @ self.gpoints.T  # (natom, nG)
        self.sion_re = np.cos(phases).T @ self.atom_charges
        self.sion_im = np.sin(phases).T @ self.atom_charges

    # --- host-side psi for constants & tests -------------------------------
    def psi_host(self, r):
        from scipy.special import erfc as np_erfc

        r = np.asarray(r, dtype=np.float64).reshape(-1, 3)
        d = r[:, None, :] + self.images[None, :, :]
        dn = np.linalg.norm(d, axis=-1)
        real = np.sum(np_erfc(self.alpha * dn) / dn, axis=1)
        rec = np.cos(r @ self.gpoints.T) @ self.gweights
        return real + rec - np.pi / (self.volume * self.alpha**2)

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

    # --- device-side energy -------------------------------------------------
    def energy(self, positions):
        """Returns (ee, ei, ii) per walker; positions (nconf, ne, 3)."""
        dtype = positions.dtype
        nconf, ne = positions.shape[:2]
        a = dtype.type(self.alpha) if hasattr(dtype, "type") else self.alpha
        images = jnp.asarray(self.images, dtype)
        gp = jnp.asarray(self.gpoints, dtype)
        gw = jnp.asarray(self.gweights, dtype)
        backg = np.pi / (self.volume * self.alpha**2)

        # ---- ee real space: pairs i<j over all images
        d = positions[:, :, None, :] - positions[:, None, :, :]  # (c, i, j, 3)
        iu = jnp.triu_indices(ne, k=1)
        dpair = d[:, iu[0], iu[1], :]  # (c, np, 3)
        dimg = dpair[:, :, None, :] + images[None, None, :, :]
        dist = jnp.sqrt(jnp.sum(dimg * dimg, axis=-1))
        ee_real = jnp.sum(erfc(self.alpha * dist) / dist, axis=(1, 2))

        # ---- ee reciprocal via structure factor
        phase = positions @ gp.T  # (c, ne, nG)
        s_re = jnp.sum(jnp.cos(phase), axis=1)
        s_im = jnp.sum(jnp.sin(phase), axis=1)
        s2 = s_re * s_re + s_im * s_im
        ee_rec = 0.5 * jnp.sum(gw[None, :] * (s2 - ne), axis=1)

        npair = ne * (ne - 1) / 2.0
        ee = ee_real + ee_rec - npair * backg + 0.5 * ne * self.xi

        # ---- ei real space
        dei = positions[:, :, None, :] - jnp.asarray(self.atom_coords, dtype)[None, None]
        deimg = dei[:, :, :, None, :] + images[None, None, None, :, :]
        deidist = jnp.sqrt(jnp.sum(deimg * deimg, axis=-1))
        zc = jnp.asarray(self.atom_charges, dtype)
        ei_real = -jnp.sum(
            zc[None, None, :, None] * erfc(self.alpha * deidist) / deidist,
            axis=(1, 2, 3),
        )
        # ei reciprocal: - sum_G w Re(S_e conj(S_ion))
        ei_rec = -jnp.sum(
            gw[None, :]
            * (
                s_re * jnp.asarray(self.sion_re, dtype)[None, :]
                + s_im * jnp.asarray(self.sion_im, dtype)[None, :]
            ),
            axis=1,
        )
        ztot = float(np.sum(self.atom_charges))
        ei = ei_real + ei_rec + ne * ztot * backg

        ii = jnp.full(nconf, self.ii_const, dtype)
        return ee, ei, ii
