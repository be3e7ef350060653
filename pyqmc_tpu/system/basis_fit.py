"""Fit contracted valence bases for ECP atoms from scratch.

Self-contained replacement for the published correlation-consistent ECP
basis tables when exact digits are unavailable offline: run the pseudo-atom
UHF in a large even-tempered primitive sea, contract each occupied-l channel
with the atom's own HF radial function (ANO-style rank-1 contraction), and
add uncontracted valence/polarization functions chosen variationally.

The reference gets these tables from PySCF (e.g. pyqmc builds mol._basis
via pyscf.gto.M, cf. /root/reference/pyqmc/pyscftools.py); its
examples/workflow/basis_conversion.py plays a similar on-the-fly role for
even-tempered conversions.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from . import basis as basis_mod


def _pseudo_atom_scf(symbol: str, ecp, basis, spin: int):
    from .mole import Molecule
    from .scf import run_scf

    mol = Molecule(f"{symbol} 0 0 0", basis={symbol: basis}, ecp=ecp, spin=spin)
    return mol, run_scf(mol)


def _occupied_radial(mol, mf, l: int) -> np.ndarray:
    """Extract the occupied radial contraction for channel l.

    For a valence-only ECP atom each occupied l-channel is rank 1 (one
    radial function), so any occupied MO that lives in the l block carries
    the contraction coefficients (relative to unit-normalized primitives,
    i.e. raw pyscf-format coefficients). Uses the alpha-spin solution.
    """
    shells = [sh for sh in mol.shells if sh.l == l]
    if any(len(sh.exps) != 1 for sh in shells):
        raise ValueError("sea basis must be uncontracted")
    nocc = mol.nelec[0]
    C = np.asarray(mf.mo_coeff[0])[:, :nocc]
    # block rows for each m component of channel l
    rows_by_m = [
        np.array([sh.ao_offset + m for sh in shells]) for m in range(2 * l + 1)
    ]
    best = (0.0, None)
    for col in range(nocc):
        block_w = sum(float(np.sum(C[rows, col] ** 2)) for rows in rows_by_m)
        w = block_w / float(np.sum(C[:, col] ** 2))
        if w > best[0]:
            # a degenerate MO may mix m components, but the radial shape is
            # shared (rank-1 in the radial index): read it off the m column
            # with the largest norm
            rows = max(rows_by_m, key=lambda r: float(np.sum(C[r, col] ** 2)))
            best = (w, C[rows, col])
    weight, coeffs = best
    if coeffs is None or weight < 0.99:
        raise RuntimeError(f"no pure l={l} occupied MO found (best weight {weight})")
    return np.asarray(coeffs, dtype=np.float64)


def even_tempered_sea(
    l_list: Sequence[int], alpha0: float = 0.045, beta: float = 2.0, n: int = 16
) -> list:
    """Uncontracted even-tempered primitive sea in raw pyscf format."""
    return [[l, [alpha0 * beta**k, 1.0]] for l in l_list for k in range(n)]


def fit_atomic_valence_basis(
    symbol: str,
    ecp="ccecp",
    spin: int | None = None,
    occ_l: Sequence[int] = (0, 1),
    free_exps: Dict[int, Sequence[float]] | None = None,
    sea_kwargs: dict | None = None,
    prune_below: float = 1e-5,
) -> Tuple[list, dict]:
    """Build a DZ-quality contracted basis for an ECP pseudo-atom.

    Returns (raw pyscf-format basis list, info dict). The basis is one
    HF-radial contraction per occupied l plus the supplied uncontracted
    `free_exps` functions (e.g. {0: [0.26], 1: [0.16], 2: [1.2]}).
    Primitives whose contraction coefficient is below `prune_below`
    (relative) are dropped to keep the GTO tables small.
    """
    if spin is None:
        from .elements import atomic_number

        # Hund's-rule ground-state spin for main-group valence shells
        spin = {1: 1, 3: 1, 4: 0, 5: 1, 6: 2, 7: 3, 8: 2, 9: 1, 10: 0}.get(
            atomic_number(symbol), 0
        )
    sea_kwargs = dict(sea_kwargs or {})
    sea = even_tempered_sea(list(occ_l), **sea_kwargs)
    mol, mf = _pseudo_atom_scf(symbol, ecp, sea, spin)
    n_per_l = max(
        sum(1 for sh in mol.shells if sh.l == l) for l in occ_l
    )
    out = []
    for l in occ_l:
        exps = np.array([sh.exps[0] for sh in mol.shells if sh.l == l])
        coeffs = _occupied_radial(mol, mf, l)
        keep = np.abs(coeffs) >= prune_below * np.abs(coeffs).max()
        out.append([l] + [[float(e), float(c)] for e, c in zip(exps[keep], coeffs[keep])])
    for l, exps in sorted((free_exps or {}).items()):
        for e in exps:
            out.append([l, [float(e), 1.0]])
    info = {"sea_e_tot": float(mf.e_tot), "spin": spin, "n_sea_per_l": n_per_l}
    return out, info
