"""Supercell construction and twist mapping (port of pyqmc/pbc/supercell.py
and pyqmc/pbc/twists.py; host-side numpy).

A supercell is defined by an integer matrix S: A_super = S @ A_prim. The
primitive-cell k-point mesh folds onto supercell twists Theta: a primitive k
belongs to twist Theta iff k = Theta + G_super for a supercell reciprocal
vector G_super.
"""

from __future__ import annotations

import numpy as np

from .mole import Cell


def primitive_translations(S: np.ndarray) -> np.ndarray:
    """Integer primitive-lattice points inside the supercell (|det S| of them)."""
    S = np.asarray(S, dtype=int)
    n = abs(int(round(np.linalg.det(S))))
    # candidates: all integer combos within the bounding box of S
    bounds = np.abs(S).sum(axis=0)
    rngs = [np.arange(-b, b + 1) for b in bounds]
    pts = np.array(np.meshgrid(*rngs, indexing="ij")).reshape(3, -1).T
    frac = pts @ np.linalg.inv(S)
    inside = np.all((frac > -1e-9) & (frac < 1 - 1e-9), axis=1)
    sel = pts[inside]
    assert len(sel) == n, (len(sel), n)
    return sel


def get_supercell(cell: Cell, S) -> Cell:
    """Replicate a primitive Cell into the supercell defined by S."""
    S = np.asarray(S, dtype=int)
    trans = primitive_translations(S) @ cell.lattice  # cartesian shifts
    atoms = []
    for t in trans:
        for sym, coord in zip(cell.atom_symbols, cell.atom_coords):
            atoms.append((sym, np.asarray(coord) + t))
    sup = Cell(
        atoms,
        lattice=S @ cell.lattice,
        basis={el: cell.basis[el] for el in set(cell.atom_symbols)},
        ecp={el: cell.ecp[el] for el in cell.ecp} if cell.ecp else None,
        spin=cell.spin * len(trans),
    )
    sup.original_cell = cell
    sup.S = S
    sup.scale = len(trans)
    return sup


def get_supercell_kpts(supercell, primitive_kpts, twist=None, tol=1e-8):
    """Primitive k-points compatible with a given supercell twist.

    twist: fractional coords of the twist in the supercell BZ (3,), default 0.
    Returns (indices into primitive_kpts, twist_cartesian).
    """
    recip_s = 2 * np.pi * np.linalg.inv(supercell.lattice).T  # rows
    if twist is None:
        twist = np.zeros(3)
    twist_cart = np.asarray(twist) @ recip_s
    frac = (np.asarray(primitive_kpts) - twist_cart) @ supercell.lattice.T / (2 * np.pi)
    is_int = np.all(np.abs(frac - np.round(frac)) < tol, axis=1)
    return np.nonzero(is_int)[0], twist_cart


def create_supercell_twists(supercell, primitive_kpts, tol=1e-8):
    """Group a primitive k-mesh by supercell twist (pbc/twists.py:36-65).

    Returns dict: {twist_frac_tuple: indices array}.
    """
    frac = np.asarray(primitive_kpts) @ supercell.lattice.T / (2 * np.pi)
    frac_mod = frac - np.floor(frac + tol)
    groups = {}
    for i, f in enumerate(np.round(frac_mod, 8)):
        key = tuple(f)
        groups.setdefault(key, []).append(i)
    return {k: np.asarray(v) for k, v in groups.items()}


def replicate_jastrow_params(jastrow_prim, jastrow_super, params_prim):
    """Map primitive-cell Jastrow coefficients onto a supercell Jastrow
    (make_supercell_jastrow parity, pbc/supercell.py:81-91).

    Atom-resolved acoeff rows are tiled over the replicas (supercell atoms
    are ordered translation-major, matching get_supercell); bcoeff is
    translation-invariant and copied.
    """
    import jax.numpy as jnp

    nrep = jastrow_super.natom // jastrow_prim.natom
    out = dict(params_prim)
    if "acoeff" in params_prim:
        out["acoeff"] = jnp.tile(params_prim["acoeff"], (nrep, 1, 1))
    if "ccoeff" in params_prim:
        out["ccoeff"] = jnp.tile(
            params_prim["ccoeff"], (nrep,) + (1,) * (params_prim["ccoeff"].ndim - 1)
        )
    return out
