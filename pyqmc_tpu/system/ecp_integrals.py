"""Numerical ECP matrix elements for the SCF front-end.

The reference relies on PySCF for ECP-SCF; standalone, we evaluate

  V[mu,nu] = <chi_mu | V_loc + sum_l v_l(r) sum_m |Y_lm><Y_lm| | chi_nu>

on an atom-centered product grid: Gauss-Legendre radial x Gauss-Legendre
(cos theta) x uniform phi angular. Accuracy ~1e-8 Ha for standard ccECP
gaussian-type channels. Host-side numpy+jax (one-time setup cost).
"""

import numpy as np
from numpy.polynomial.legendre import leggauss

from ..ops.gto import GTOSpec, eval_gto
from ..ops.harmonics import cart2sph_matrix, cart_components
from ..observables.ecp import _parse_ecp


def _real_sph(l, unit):
    """Real spherical harmonics Y_lm at unit vectors (n, 3) -> (n, 2l+1)."""
    C = cart2sph_matrix(l)
    comps = cart_components(l)
    mono = np.stack(
        [unit[:, 0] ** i * unit[:, 1] ** j * unit[:, 2] ** k for (i, j, k) in comps],
        axis=-1,
    )
    return mono @ C


def _angular_grid(ntheta=20, nphi=40):
    x, wx = leggauss(ntheta)  # cos(theta) nodes
    phi = (np.arange(nphi) + 0.5) * (2 * np.pi / nphi)
    wphi = 2 * np.pi / nphi
    ct, ph = np.meshgrid(x, phi, indexing="ij")
    st = np.sqrt(1 - ct**2)
    pts = np.stack([st * np.cos(ph), st * np.sin(ph), ct], axis=-1).reshape(-1, 3)
    w = (wx[:, None] * wphi * np.ones(nphi)[None, :]).reshape(-1)
    return pts, w  # integrates to 4 pi


def ecp_matrix(mol, nrad=80, rmax=10.0, ntheta=20, nphi=40):
    """(nao, nao) ECP potential matrix over spherical AOs."""
    spec = GTOSpec.from_molecule(mol)
    atoms = _parse_ecp(mol)
    nao = mol.nao
    V = np.zeros((nao, nao))
    if not atoms:
        return V

    # radial grid: Gauss-Legendre in t over [0,1] mapped r = rmax * t^2 —
    # clusters points near the origin where ccECP channels (r^-1 e^{-a r^2})
    # concentrate; a uniform grid loses ~0.04 Ha on Li.
    xt, wt = leggauss(nrad)
    t = 0.5 * (xt + 1.0)
    r = rmax * t * t
    wr = 0.5 * wt * 2.0 * rmax * t
    ang, wang = _angular_grid(ntheta, nphi)  # (nang, 3), (nang,)
    nang = len(wang)

    for aecp in atoms:
        R = mol.atom_coords[aecp.atom]
        # all grid points: (nrad, nang, 3)
        pts = R[None, None, :] + r[:, None, None] * ang[None, :, :]
        ao = np.asarray(eval_gto(spec, pts.reshape(-1, 3), mode=0)).reshape(
            nrad, nang, nao
        )
        # local part: integral chi_mu V_loc chi_nu over full grid
        vloc = np.asarray(aecp.local.evaluate(r))  # (nrad,)
        wfull = (wr * vloc * r * r)[:, None] * wang[None, :]
        V += np.einsum("rga,rg,rgb->ab", ao, wfull, ao, optimize=True)
        # nonlocal: A_lm,mu(r) = int dOmega Y_lm chi_mu
        for ch in aecp.nonlocal_channels:
            Y = _real_sph(ch.l, ang)  # (nang, 2l+1)
            A = np.einsum("gm,g,rga->rma", Y, wang, ao, optimize=True)
            vl = np.asarray(ch.evaluate(r))
            V += np.einsum("r,rma,rmb->ab", wr * vl * r * r, A, A, optimize=True)
    return 0.5 * (V + V.T)
