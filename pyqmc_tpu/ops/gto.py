"""Batched GTO (atomic orbital) evaluation — the innermost kernel.

TPU-first replacement for the reference's numba AO kernels
(pyqmc/wf/numba/gto.py:89-502) and its partial JAX evaluator
(pyqmc/wf/jax/gto.py:21-308). Differences from both:

  * spherical (not cartesian-only) via exact cart->solid-harmonic tables
    (ops/harmonics.py) — one tiny matmul per l-group instead of 1.2k lines of
    unrolled harmonics;
  * fully padded static shapes: shells padded to a common primitive count,
    grouped by angular momentum at trace time; no data-dependent shapes;
  * value / +gradient / +laplacian share one code path, selected statically;
  * everything is elementwise VPU work plus small matmuls; the big MXU matmul
    (AO @ mo_coeff) lives in the orbital evaluator above this.

Derivative algebra: for f = P(x,y,z) * g(r^2), P a degree-l monomial,
g = sum_p c_p exp(-a_p r^2):
    grad f = (grad P) g0 - 2 P g1 r
    lap  f = (lap P) g0 - (4 l + 6) P g1 + 4 P g2 r^2
with g_k = sum_p c_p a_p^k exp(-a_p r^2) and Euler's identity r.grad P = l P.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .harmonics import cart2sph_matrix, cart_components, ncart


@dataclasses.dataclass(frozen=True)
class _LGroup:
    l: int
    shell_atoms: np.ndarray  # (S,) atom index per shell in this group
    alpha: np.ndarray  # (S, P) padded exponents
    coef: np.ndarray  # (S, P) padded coefficients (0 padding)
    ao_pos: np.ndarray  # (S * (2l+1),) target AO indices


@dataclasses.dataclass(frozen=True)
class GTOSpec:
    """Static AO-evaluation tables built host-side from a Molecule/Cell."""

    groups: Tuple[_LGroup, ...]
    perm: np.ndarray  # concat order -> AO order gather indices
    nao: int
    atom_coords: np.ndarray  # (natom, 3)

    @staticmethod
    def from_molecule(mol) -> "GTOSpec":
        return GTOSpec.from_shells(mol.shells, np.asarray(mol.atom_coords), mol.nao)

    @staticmethod
    def from_shells(shell_list, atom_coords, nao) -> "GTOSpec":
        """Build from an explicit shell table (each entry needs .l, .exps,
        .coeffs, .atom, .ao_offset); used for replicated PBC shell tables
        where every (shell, image) pair has its own center."""
        mol_shells = shell_list
        groups = []
        concat_ao = []
        for l in sorted({s.l for s in mol_shells}):
            shells = [s for s in mol_shells if s.l == l]
            pmax = max(len(s.exps) for s in shells)
            alpha = np.zeros((len(shells), pmax))
            coef = np.zeros((len(shells), pmax))
            atoms = np.zeros(len(shells), dtype=np.int32)
            ao_pos = []
            for i, s in enumerate(shells):
                n = len(s.exps)
                alpha[i, :n] = s.exps
                # pad with alpha=1 to avoid exp(0)=1 contributions; coef=0
                # kills them but alpha=0 would still be fine numerically.
                alpha[i, n:] = 1.0
                coef[i, :n] = s.coeffs
                atoms[i] = s.atom
                ao_pos.extend(range(s.ao_offset, s.ao_offset + 2 * l + 1))
            groups.append(
                _LGroup(
                    l=l,
                    shell_atoms=atoms,
                    alpha=alpha,
                    coef=coef,
                    ao_pos=np.array(ao_pos, dtype=np.int64),
                )
            )
            concat_ao.extend(ao_pos)
        perm = np.argsort(np.array(concat_ao))
        return GTOSpec(
            groups=tuple(groups),
            perm=perm,
            nao=nao,
            atom_coords=np.asarray(atom_coords),
        )


def _monomials(xs, comps):
    """Evaluate monomial products for components [(lx,ly,lz)].

    xs: tuple of (x, y, z) arrays of shape (..., S). Returns (..., S, ncart).
    Uses cached integer powers so each monomial is <=2 multiplies.
    """
    l = sum(comps[0])
    pows = []
    for a in xs:
        p = [jnp.ones_like(a), a]
        for k in range(2, l + 1):
            p.append(p[-1] * a)
        pows.append(p)
    cols = [pows[0][i] * pows[1][j] * pows[2][k] for (i, j, k) in comps]
    return jnp.stack(cols, axis=-1)


def eval_gto(spec: GTOSpec, X, mode: int = 0, shift: Optional[jnp.ndarray] = None):
    """Evaluate all AOs at points X.

    Args:
      spec: static GTOSpec.
      X: (..., 3) evaluation points.
      mode: 0 -> value; 1 -> value+grad; 2 -> value+grad+laplacian. Static.
      shift: optional (3,) lattice translation added to atom positions
             (used by the periodic evaluator's image sum).

    Returns:
      ao: (..., nao); and if mode>=1 grad (..., 3, nao); if mode==2
      lap (..., nao).
    """
    batch_shape = X.shape[:-1]
    M = int(np.prod(batch_shape)) if batch_shape else 1
    Xf = X.reshape(M, 3)
    dtype = X.dtype

    atom_xyz = jnp.asarray(spec.atom_coords, dtype=dtype)
    if shift is not None:
        atom_xyz = atom_xyz + shift[None, :]

    vals, grads, laps = [], [], []
    for g in spec.groups:
        centers = atom_xyz[jnp.asarray(g.shell_atoms)]  # (S, 3)
        r = Xf[:, None, :] - centers[None, :, :]  # (M, S, 3)
        r2 = jnp.sum(r * r, axis=-1)  # (M, S)
        alpha = jnp.asarray(g.alpha, dtype=dtype)  # (S, P)
        coef = jnp.asarray(g.coef, dtype=dtype)
        e = jnp.exp(-r2[:, :, None] * alpha[None])  # (M, S, P)
        g0 = jnp.einsum("msp,sp->ms", e, coef)
        if mode >= 1:
            g1 = jnp.einsum("msp,sp->ms", e, coef * alpha)
        if mode >= 2:
            g2 = jnp.einsum("msp,sp->ms", e, coef * alpha * alpha)

        comps = cart_components(g.l)
        x, y, z = r[..., 0], r[..., 1], r[..., 2]
        P = _monomials((x, y, z), comps)  # (M, S, C)
        C = jnp.asarray(cart2sph_matrix(g.l), dtype=dtype)  # (C, 2l+1)

        val_cart = P * g0[..., None]
        vals.append(jnp.einsum("msc,cq->msq", val_cart, C).reshape(M, -1))

        if mode >= 1:
            # dP tables: derivative of each monomial along each axis
            dP = []
            for ax in range(3):
                cols = []
                for (i, j, k) in comps:
                    exps = [i, j, k]
                    n = exps[ax]
                    if n == 0:
                        cols.append(jnp.zeros_like(x))
                    else:
                        exps2 = list(exps)
                        exps2[ax] = n - 1
                        mono = _monomials((x, y, z), [tuple(exps2)])[..., 0]
                        cols.append(n * mono)
                dP.append(jnp.stack(cols, axis=-1))  # (M, S, C)
            dP = jnp.stack(dP, axis=1)  # (M, 3, S, C)
            grad_cart = dP * g0[:, None, :, None] - 2.0 * (
                r.transpose(0, 2, 1)[..., None] * (P * g1[..., None])[:, None]
            )
            grads.append(
                jnp.einsum("mxsc,cq->mxsq", grad_cart, C).reshape(M, 3, -1)
            )

        if mode >= 2:
            lapP = jnp.zeros_like(P)
            cols = []
            for (i, j, k) in comps:
                acc = jnp.zeros_like(x)
                for ax, n in enumerate((i, j, k)):
                    if n >= 2:
                        exps2 = [i, j, k]
                        exps2[ax] = n - 2
                        mono = _monomials((x, y, z), [tuple(exps2)])[..., 0]
                        acc = acc + n * (n - 1) * mono
                cols.append(acc)
            lapP = jnp.stack(cols, axis=-1)
            lap_cart = (
                lapP * g0[..., None]
                - (4.0 * g.l + 6.0) * P * g1[..., None]
                + 4.0 * P * (g2 * r2)[..., None]
            )
            laps.append(jnp.einsum("msc,cq->msq", lap_cart, C).reshape(M, -1))

    perm = jnp.asarray(spec.perm)
    ao = jnp.concatenate(vals, axis=-1)[:, perm].reshape(*batch_shape, spec.nao)
    if mode == 0:
        return ao
    grad = jnp.concatenate(grads, axis=-1)[:, :, perm].reshape(
        *batch_shape, 3, spec.nao
    )
    if mode == 1:
        return ao, grad
    lap = jnp.concatenate(laps, axis=-1)[:, perm].reshape(*batch_shape, spec.nao)
    return ao, grad, lap
