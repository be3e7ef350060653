"""Helpers to rebuild periodic systems from the extracted SCF fixtures
(tests/files/*.npz, produced by tools/extract_fixtures.py)."""

import json
import os

import numpy as np

from pyqmc_tpu.system.mole import Cell

FILES = os.path.join(os.path.dirname(__file__), "files")


def load_cell(name):
    """Returns (Cell, dict of arrays)."""
    d = dict(np.load(os.path.join(FILES, f"{name}.npz")))
    basis = json.loads(bytes(d["basis_json"]).decode())
    ecp = json.loads(bytes(d["ecp_json"]).decode())
    atoms = [
        (s.decode(), c) for s, c in zip(d["atom_symbols"], d["atom_coords"])
    ]
    cell = Cell(
        atoms,
        lattice=d["lattice"],
        basis=basis,
        ecp=ecp if ecp else None,
        spin=int(d["spin"]),
    )
    return cell, d
