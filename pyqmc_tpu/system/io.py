"""System + mean-field HDF5 serialization.

Counterpart of the reference's checkpoint-recovery workflow
(pyqmc/pyscftools.py:30-102 recovers pyscf mol/mf from HDF5): here the
framework owns the format. save_system/load_system round-trip a
Molecule/Cell and its SCF solution so QMC jobs can start from a file.
"""

from __future__ import annotations

import json

import numpy as np

from .mole import Molecule, Cell
from .scf import MeanField
from .basis import Shell


def _basis_to_json(basis):
    out = {}
    for el, shells in basis.items():
        out[el] = [
            [s.l] + [[e, c] for e, c in zip(s.exps, s.coeffs)] for s in shells
        ]
    return json.dumps(out)


def save_system(f, mol, mf: MeanField = None):
    """Write under groups 'system' (+ 'scf'). f: open h5py.File."""
    g = f.require_group("system")

    def put(name, data):
        if name in g:
            del g[name]
        g.create_dataset(name, data=data)

    put("atom_symbols", np.array(mol.atom_symbols, dtype="S4"))
    put("atom_coords", mol.atom_coords)
    put("charge", mol.charge)
    put("spin", mol.spin)
    # NOTE: stored coefficients are already normalized; loader must not
    # renormalize (raw=False marker).
    put("basis_json", np.bytes_(_basis_to_json(mol.basis)))
    put("ecp_json", np.bytes_(json.dumps(mol.ecp)))
    if mol.lattice is not None:
        put("lattice", mol.lattice)
    if mf is not None:
        s = f.require_group("scf")

        def puts(name, data):
            if name in s:
                del s[name]
            s.create_dataset(name, data=data)

        puts("mo_coeff_alpha", np.asarray(mf.mo_coeff[0]))
        puts("mo_coeff_beta", np.asarray(mf.mo_coeff[1]))
        puts("mo_energy_alpha", np.asarray(mf.mo_energy[0]))
        puts("mo_energy_beta", np.asarray(mf.mo_energy[1]))
        puts("mo_occ_alpha", np.asarray(mf.mo_occ[0]))
        puts("mo_occ_beta", np.asarray(mf.mo_occ[1]))
        puts("e_tot", mf.e_tot)
        puts("restricted", mf.restricted)


def load_system(f):
    """Returns (mol, mf or None) from a file written by save_system."""
    g = f["system"]
    syms = [s.decode() for s in np.asarray(g["atom_symbols"])]
    coords = np.asarray(g["atom_coords"])
    atoms = list(zip(syms, coords))
    raw = json.loads(bytes(np.asarray(g["basis_json"])).decode())
    # stored coefficients are normalized: build Shell objects directly
    basis = {
        el: [
            Shell(
                l=int(entry[0]),
                exps=tuple(p[0] for p in entry[1:]),
                coeffs=tuple(p[1] for p in entry[1:]),
            )
            for entry in entries
        ]
        for el, entries in raw.items()
    }
    ecp = json.loads(bytes(np.asarray(g["ecp_json"])).decode()) or None
    kwargs = dict(
        basis=basis, ecp=ecp, charge=int(np.asarray(g["charge"])),
        spin=int(np.asarray(g["spin"])),
    )
    if "lattice" in g:
        mol = Cell(atoms, lattice=np.asarray(g["lattice"]), **kwargs)
    else:
        mol = Molecule(atoms, **kwargs)
    mf = None
    if "scf" in f:
        s = f["scf"]
        mf = MeanField(
            mol=mol,
            mo_coeff=(np.asarray(s["mo_coeff_alpha"]), np.asarray(s["mo_coeff_beta"])),
            mo_energy=(np.asarray(s["mo_energy_alpha"]), np.asarray(s["mo_energy_beta"])),
            mo_occ=(np.asarray(s["mo_occ_alpha"]), np.asarray(s["mo_occ_beta"])),
            e_tot=float(np.asarray(s["e_tot"])),
            restricted=bool(np.asarray(s["restricted"])),
        )
    return mol, mf
