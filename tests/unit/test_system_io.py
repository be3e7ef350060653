"""System/SCF HDF5 round-trip (recover_pyscf-workflow parity)."""

import h5py
import numpy as np
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.system.io import save_system, load_system
from pyqmc_tpu.system import integrals


def test_roundtrip_molecule(tmp_path):
    mol = Molecule("Li 0 0 0", basis="ccecpccpvdz", ecp="ccecp", spin=1)
    mf = run_scf(mol)
    p = str(tmp_path / "sys.h5")
    with h5py.File(p, "w") as f:
        save_system(f, mol, mf)
    with h5py.File(p, "r") as f:
        mol2, mf2 = load_system(f)
    assert mol2.nelec == mol.nelec
    assert np.array_equal(mol2.atom_charges, mol.atom_charges)
    np.testing.assert_allclose(mf2.mo_coeff[0], mf.mo_coeff[0])
    np.testing.assert_allclose(mf2.e_tot, mf.e_tot)
    # basis round-trips without double normalization: overlaps identical
    S1, _ = integrals.overlap_kinetic(mol)
    S2, _ = integrals.overlap_kinetic(mol2)
    np.testing.assert_allclose(S1, S2, atol=1e-14)
    # and the ECP survived
    assert "Li" in mol2.ecp


def test_roundtrip_cell(tmp_path):
    from pyqmc_tpu.system.mole import Cell

    cell = Cell("H 0 0 0; H 0 0 2.0", lattice=np.eye(3) * 8.0, basis="sto-3g")
    p = str(tmp_path / "cell.h5")
    with h5py.File(p, "w") as f:
        save_system(f, cell)
    with h5py.File(p, "r") as f:
        cell2, _ = load_system(f)
    np.testing.assert_allclose(cell2.lattice, cell.lattice)
