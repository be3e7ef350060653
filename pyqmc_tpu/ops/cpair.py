"""Complex arithmetic as explicit (re, im) real-array pairs.

For TPU backends that implement no complex ops at all (see
models/slater_embedded.py). Everything here is ordinary real jnp, so it
compiles anywhere. Includes a batched complex LU (partial pivoting) in pair
form that returns phase, log|det| and the complex inverse — the pieces the
multi-determinant general-twist Slater needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def cdiv(ar, ai, br, bi):
    d = br * br + bi * bi
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def cabs2(ar, ai):
    return ar * ar + ai * ai


def pair_lu_slogdet_inv(are, aim):
    """Batched complex LU via Gauss-Jordan in pair arithmetic.

    are/aim: (..., n, n). Returns (phase_re, phase_im, logabs, inv_re,
    inv_im) with phase unit-modulus. Mirrors ops/linalg._lu_slogdet_inv.
    """
    batch = are.shape[:-2]
    n = are.shape[-1]
    Ar = are.reshape((-1, n, n))
    Ai = aim.reshape((-1, n, n))
    B = Ar.shape[0]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=are.dtype), Ar.shape)
    Xr = eye
    Xi = jnp.zeros_like(eye)
    phr = jnp.ones(B, dtype=are.dtype)
    phi = jnp.zeros(B, dtype=are.dtype)
    logabs = jnp.zeros(B, dtype=are.dtype)

    def body(k, carry):
        Ar, Ai, Xr, Xi, phr, phi, logabs = carry
        mag = cabs2(Ar[:, :, k], Ai[:, :, k])
        mag = jnp.where((jnp.arange(n) >= k)[None, :], mag, -1.0)
        piv = jnp.argmax(mag, axis=1)
        idx = jnp.broadcast_to(jnp.arange(n)[None, :], (B, n))
        idx = idx.at[:, k].set(piv)
        idx = jnp.where(jnp.arange(n)[None, :] == piv[:, None], k, idx)

        def swap(M):
            return jnp.take_along_axis(M, idx[:, :, None], axis=1)

        Ar, Ai, Xr, Xi = swap(Ar), swap(Ai), swap(Xr), swap(Xi)
        sgn = jnp.where(piv != k, -1.0, 1.0)
        phr, phi = phr * sgn, phi * sgn
        pr, pi = Ar[:, k, k], Ai[:, k, k]
        am = jnp.sqrt(jnp.maximum(cabs2(pr, pi), jnp.finfo(are.dtype).tiny))
        fr, fi = cmul(phr, phi, pr / am, pi / am)
        phr, phi = fr, fi
        logabs = logabs + jnp.log(am)
        # eliminate column k in all rows but k
        qr, qi = cdiv(Ar[:, :, k], Ai[:, :, k], pr[:, None], pi[:, None])
        sel = (jnp.arange(n) != k).astype(are.dtype)
        qr, qi = qr * sel[None, :], qi * sel[None, :]
        rowAr, rowAi = Ar[:, k, :], Ai[:, k, :]
        rowXr, rowXi = Xr[:, k, :], Xi[:, k, :]
        dr, di = cmul(qr[:, :, None], qi[:, :, None], rowAr[:, None, :], rowAi[:, None, :])
        Ar, Ai = Ar - dr, Ai - di
        dr, di = cmul(qr[:, :, None], qi[:, :, None], rowXr[:, None, :], rowXi[:, None, :])
        Xr, Xi = Xr - dr, Xi - di
        return Ar, Ai, Xr, Xi, phr, phi, logabs

    Ar, Ai, Xr, Xi, phr, phi, logabs = jax.lax.fori_loop(
        0, n, body, (Ar, Ai, Xr, Xi, phr, phi, logabs)
    )
    dr = jnp.diagonal(Ar, axis1=1, axis2=2)
    di = jnp.diagonal(Ai, axis1=1, axis2=2)
    ir, ii = cdiv(Xr, Xi, dr[:, :, None], di[:, :, None])
    return (
        phr.reshape(batch),
        phi.reshape(batch),
        logabs.reshape(batch),
        ir.reshape(are.shape),
        ii.reshape(are.shape),
    )


def pair_sherman_morrison_row(invr, invi, ur, ui, row):
    """Complex SM row replacement in pair arithmetic.

    invr/invi: (..., n, n); ur/ui: (..., n); returns (rr, ri, invr', invi').
    """
    tr = jnp.einsum("...k,...kj->...j", ur, invr) - jnp.einsum(
        "...k,...kj->...j", ui, invi
    )
    ti = jnp.einsum("...k,...kj->...j", ur, invi) + jnp.einsum(
        "...k,...kj->...j", ui, invr
    )
    rr, ri = tr[..., row], ti[..., row]
    colr = invr[..., :, row]
    coli = invi[..., :, row]
    # outer(col, t) / r
    outr, outi = cmul(colr[..., :, None], coli[..., :, None], tr[..., None, :], ti[..., None, :])
    d = cabs2(rr, ri)[..., None, None]
    qr = (outr * rr[..., None, None] + outi * ri[..., None, None]) / d
    qi = (outi * rr[..., None, None] - outr * ri[..., None, None]) / d
    newr = invr - qr
    newi = invi - qi
    ncr, nci = cdiv(colr, coli, rr[..., None], ri[..., None])
    newr = newr.at[..., :, row].set(ncr)
    newi = newi.at[..., :, row].set(nci)
    return rr, ri, newr, newi
