"""Extract physical data (basis sets, ECP parameters, geometries, SCF MO
coefficients) from the reference test checkpoints into this repo's own fixture
format (.npz + printed python dicts).

This extracts *data* (public physical constants / SCF solutions), not code.
Run manually; outputs land in tests/files/.
"""

import json
import os

import h5py
import numpy as np

REF = "/root/reference/tests/files"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "files")
os.makedirs(OUT, exist_ok=True)

for name in [
    "li_cubic_ccecp",
    "diamond_primitive",
    "h_noncubic_sto3g_triplet",
    "h_pbc_casscf",
]:
    with h5py.File(f"{REF}/{name}.hdf5", "r") as f:
        mol = json.loads(f["mol"][()])
        print("=" * 70)
        print(name)
        print("basis =", json.dumps(mol["_basis"]))
        print("ecp =", json.dumps(mol.get("_ecp", {})))
        print("atoms =", mol["_atom"])
        print("lattice =", mol.get("a"))
        print("spin =", mol.get("spin", 0))
        data = {}
        scf = f["scf"]
        data["e_tot"] = np.asarray(scf["e_tot"])
        if "kpts" in scf:
            data["kpts"] = np.asarray(scf["kpts"])
        for key in ("mo_coeff", "mo_energy", "mo_occ"):
            lk = f"{key}__from_list__"
            if lk in scf:
                items = [np.asarray(scf[lk][k]) for k in sorted(scf[lk].keys())]
                data[key] = np.stack(items)
            elif key in scf:
                data[key] = np.asarray(scf[key])
        data["atom_symbols"] = np.array([a[0] for a in mol["_atom"]], dtype="S4")
        data["atom_coords"] = np.array([a[1] for a in mol["_atom"]])  # always bohr
        if mol.get("a") is not None:
            lattice = np.array(mol["a"], dtype=float)
            # mol["a"] is in the *input* unit; pyscf default is angstrom
            unit = str(mol.get("unit", "angstrom")).lower()
            if unit.startswith("a"):
                lattice = lattice / 0.52917721092
            data["lattice"] = lattice
        data["spin"] = np.array(mol.get("spin", 0))
        data["basis_json"] = np.array(json.dumps(mol["_basis"]), dtype="S")
        data["ecp_json"] = np.array(json.dumps(mol.get("_ecp", {})), dtype="S")
        np.savez(f"{OUT}/{name}.npz", **data)
        print("mo_coeff shape:", data.get("mo_coeff", np.zeros(0)).shape)
