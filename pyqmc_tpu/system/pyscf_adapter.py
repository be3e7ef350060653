"""Optional PySCF interoperability (gated import).

When pyscf is installed, these helpers convert pyscf Mole/Cell/mean-field
objects into pyqmc_tpu systems (the reverse of what this standalone build
normally does). Covers the role of pyqmc/pyscftools.py:30-191 for users who
prepare wavefunctions with pyscf.
"""

from __future__ import annotations

import numpy as np

from .mole import Molecule, Cell
from .scf import MeanField


def _require_pyscf():
    try:
        import pyscf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "pyscf is not installed; pyqmc_tpu runs standalone (see "
            "pyqmc_tpu.system.scf) — this adapter only works with pyscf "
            "available"
        ) from exc


def from_pyscf_mol(pmol):
    """Build a pyqmc_tpu Molecule/Cell from a pyscf Mole/Cell."""
    _require_pyscf()
    atoms = [(pmol.atom_symbol(i), pmol.atom_coord(i)) for i in range(pmol.natm)]
    basis = {k: v for k, v in pmol._basis.items()}
    ecp = {k: v for k, v in getattr(pmol, "_ecp", {}).items()} or None
    lattice = getattr(pmol, "a", None)
    kwargs = dict(basis=basis, ecp=ecp, spin=pmol.spin, charge=pmol.charge)
    if lattice is not None:
        import numpy as _np

        return Cell(atoms, lattice=_np.asarray(pmol.lattice_vectors()), **kwargs)
    return Molecule(atoms, **kwargs)


def from_pyscf_mf(pmf):
    """Build (Molecule/Cell, MeanField) from a converged pyscf SCF object."""
    _require_pyscf()
    mol = from_pyscf_mol(pmf.mol)
    mo = pmf.mo_coeff
    moe = pmf.mo_energy
    occ = pmf.mo_occ
    if np.asarray(mo).ndim == 2:  # restricted
        mo = (np.asarray(mo), np.asarray(mo))
        moe = (np.asarray(moe), np.asarray(moe))
        occ2 = np.asarray(occ)
        occ = (np.clip(occ2, 0, 1), np.clip(occ2 - 1, 0, 1))
        restricted = True
    else:
        mo = (np.asarray(mo[0]), np.asarray(mo[1]))
        moe = (np.asarray(moe[0]), np.asarray(moe[1]))
        occ = (np.asarray(occ[0]), np.asarray(occ[1]))
        restricted = False
    return mol, MeanField(
        mol=mol, mo_coeff=mo, mo_energy=moe, mo_occ=occ,
        e_tot=float(pmf.e_tot), restricted=restricted,
    )
