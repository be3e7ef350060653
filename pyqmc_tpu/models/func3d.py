"""Jastrow radial basis functions (port of pyqmc/wf/func3d.py:52-210).

Pure functions of distance r returning (value, f'(r)/r, laplacian-radial
f'' + 2f'/r) so callers assemble cartesian gradients as (f'/r) * d_vec.
All are C^1-cutoff at rcut and safe at r=0 and r>=rcut under jit.
"""

from typing import NamedTuple

import jax.numpy as jnp


class BasisFn(NamedTuple):
    """Static descriptor: kind 'polypade' | 'cutoffcusp', parameter, rcut."""

    kind: str
    param: float  # beta for polypade, gamma for cutoffcusp
    rcut: float


def polypade_all(r, beta, rcut):
    """PolyPade (func3d.py:52-109): f=(1-z)/(1+beta z), z=x^2(6-8x+3x^2)."""
    x = jnp.clip(r / rcut, 0.0, 1.0)
    z = x * x * (6.0 - 8.0 * x + 3.0 * x * x)
    dzdx = 12.0 * x * (1.0 - x) ** 2
    d2zdx2 = 12.0 * (1.0 - x) * (1.0 - 3.0 * x)
    den = 1.0 + beta * z
    f = (1.0 - z) / den
    dfdz = -(1.0 + beta) / (den * den)
    d2fdz2 = 2.0 * beta * (1.0 + beta) / (den * den * den)
    fp = dfdz * dzdx / rcut  # df/dr
    fpp = (d2fdz2 * dzdx * dzdx + dfdz * d2zdx2) / (rcut * rcut)
    inside = r < rcut
    rsafe = jnp.where(r > 1e-12, r, 1e-12)
    # fp/r is finite at r->0: dzdx ~ 12x, so fp/r -> 12 dfdz / rcut^2
    fp_over_r0 = 12.0 * dfdz / rcut**2
    fp_over_r = jnp.where(r > 1e-12, fp / rsafe, fp_over_r0)
    val = jnp.where(inside, f, 0.0)
    lap = jnp.where(inside, fpp + 2.0 * fp_over_r, 0.0)
    fp_over_r = jnp.where(inside, fp_over_r, 0.0)
    return val, fp_over_r, lap


def cutoffcusp_all(r, gamma, rcut):
    """CutoffCusp (func3d.py:112-210): f = rcut*(p/(1+gamma p) - c0),
    p = y - y^2 + y^3/3, y = r/rcut; satisfies f'(0) = 1, f(rcut) = 0."""
    y = jnp.clip(r / rcut, 0.0, 1.0)
    p = y - y * y + y**3 / 3.0
    pp = (1.0 - y) ** 2  # dp/dy
    ppp = -2.0 * (1.0 - y)  # d2p/dy2
    den = 1.0 + gamma * p
    c0 = (1.0 / 3.0) / (1.0 + gamma / 3.0)
    f = rcut * (p / den - c0)
    dfdr = pp / (den * den)  # rcut * d/dy[...] / rcut
    d2fdr2 = (ppp * den - 2.0 * gamma * pp * pp) / (den**3) / rcut
    inside = r < rcut
    rsafe = jnp.where(r > 1e-12, r, 1e-12)
    val = jnp.where(inside, f, 0.0)
    fp_over_r = jnp.where(inside, dfdr / rsafe, 0.0)  # singular ~ 1/r at 0 (cusp)
    lap = jnp.where(inside, d2fdr2 + 2.0 * dfdr / rsafe, 0.0)
    return val, fp_over_r, lap


def eval_basis_all(basis, r):
    """Evaluate a static tuple of BasisFn at distances r (...,).

    Returns (value, fp_over_r, lap) each of shape (..., nk).
    """
    vals, fors, laps = [], [], []
    for b in basis:
        if b.kind == "polypade":
            v, fo, lp = polypade_all(r, b.param, b.rcut)
        elif b.kind == "cutoffcusp":
            v, fo, lp = cutoffcusp_all(r, b.param, b.rcut)
        else:
            raise ValueError(f"unknown basis kind {b.kind}")
        vals.append(v)
        fors.append(fo)
        laps.append(lp)
    return (
        jnp.stack(vals, axis=-1),
        jnp.stack(fors, axis=-1),
        jnp.stack(laps, axis=-1),
    )


def eval_basis_value(basis, r):
    vals = []
    for b in basis:
        if b.kind == "polypade":
            v, _, _ = polypade_all(r, b.param, b.rcut)
        else:
            v, _, _ = cutoffcusp_all(r, b.param, b.rcut)
        vals.append(v)
    return jnp.stack(vals, axis=-1)


def default_ee_basis(nterms=3, rcut=7.5, gamma=24.0):
    """Cusp function first, then polypade ladder (wftools.py:64-152 spirit)."""
    basis = [BasisFn("cutoffcusp", gamma, rcut)]
    basis += [BasisFn("polypade", 0.2 * 3.0**k, rcut) for k in range(nterms)]
    return tuple(basis)


def default_ei_basis(nterms=4, rcut=7.5):
    return tuple(BasisFn("polypade", 0.2 * 3.0**k, rcut) for k in range(nterms))
