"""pyscf chkfile ingestion without pyscf (system/chkfile.py).

Synthetic chkfiles are written with h5py in the exact pyscf layout
(mol JSON from Mole.dumps(): _atom in bohr + internal _basis/_ecp tables;
scf group with e_tot/mo_energy/mo_coeff/mo_occ; mcscf/ci groups for CI) —
the reference's front-door workflow recipes.OPTIMIZE(dft_checkfile)
(/root/reference/pyqmc/recipes.py:31-47, pyscftools.py:30-102).
"""

import json

import numpy as np
import jax
import h5py
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.system.basis import _BUILTIN, ECP_LIBRARY
from pyqmc_tpu.system.chkfile import recover_pyscf, read_mol, load


def _mol_json(symbols, coords_bohr, basis_name, ecp=None, charge=0, spin=0,
              a=None, unit="angstrom"):
    # pyscf keys _basis/_ecp by the (possibly labeled) input symbol: keep
    # the labels in the keys, look the data up by bare element
    import re

    el = lambda s: re.match(r"[A-Za-z]+", s).group()
    d = {
        "_atom": [[s, list(map(float, c))] for s, c in zip(symbols, coords_bohr)],
        "_basis": {s: _BUILTIN[basis_name][el(s)] for s in set(symbols)},
        "_ecp": (
            {s: ECP_LIBRARY[ecp][el(s)] for s in set(symbols)} if ecp else {}
        ),
        "charge": charge,
        "spin": spin,
        "unit": unit,
        "verbose": 0,
    }
    if a is not None:
        d["a"] = a
    return json.dumps(d)


def _write_chk(path, mol_json, scf=None, ci_group=None, ci_dict=None):
    with h5py.File(path, "w") as f:
        f["mol"] = mol_json
        if scf:
            g = f.create_group("scf")
            for k, v in scf.items():
                g[k] = v
        if ci_dict:
            g = f.create_group(ci_group)
            for k, v in ci_dict.items():
                g[k] = v


@pytest.fixture(scope="module")
def lih():
    mol = Molecule("Li 0 0 0; H 0 0 3.015", basis="sto-3g")
    return mol, run_scf(mol)


def test_rhf_roundtrip(tmp_path, lih):
    """RHF chkfile: recovered Molecule + MeanField reproduce the source
    system (basis-exact nao, same MO coefficients and energy)."""
    mol, mf = lih
    chk = str(tmp_path / "rhf.chk")
    _write_chk(
        chk,
        _mol_json(mol.atom_symbols, mol.atom_coords, "sto-3g"),
        scf={
            "e_tot": mf.e_tot,
            "mo_energy": np.asarray(mf.mo_energy[0]),
            "mo_coeff": np.asarray(mf.mo_coeff[0]),
            "mo_occ": np.asarray(mf.mo_occ[0]) + np.asarray(mf.mo_occ[1]),
        },
    )
    mol2, mf2 = recover_pyscf(chk)
    assert mol2.nao == mol.nao and mol2.nelec == mol.nelec
    np.testing.assert_allclose(mol2.atom_coords, mol.atom_coords)
    assert mf2.restricted
    np.testing.assert_allclose(mf2.e_tot, mf.e_tot)
    np.testing.assert_allclose(mf2.mo_coeff[0], mf.mo_coeff[0], atol=1e-12)
    np.testing.assert_allclose(mf2.mo_occ[0], mf.mo_occ[0])
    # basis round-trips digit-exact through the internal tables
    for el in mol.basis:
        for s1, s2 in zip(mol.basis[el], mol2.basis[el]):
            assert s1.l == s2.l
            np.testing.assert_allclose(s1.exps, s2.exps)
            np.testing.assert_allclose(s1.coeffs, s2.coeffs)


def test_uhf_and_labeled_atoms(tmp_path):
    """UHF chkfile ((2, nao, nmo) arrays) + pyscf atom labels ('H1')."""
    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g", spin=2)
    mf = run_scf(mol)
    chk = str(tmp_path / "uhf.chk")
    _write_chk(
        chk,
        _mol_json(["H1", "H2"], mol.atom_coords, "sto-3g", spin=2),
        scf={
            "e_tot": mf.e_tot,
            "mo_energy": np.stack([mf.mo_energy[0], mf.mo_energy[1]]),
            "mo_coeff": np.stack([mf.mo_coeff[0], mf.mo_coeff[1]]),
            "mo_occ": np.stack([mf.mo_occ[0], mf.mo_occ[1]]),
        },
    )
    mol2, mf2 = recover_pyscf(chk)
    assert mol2.atom_symbols == ["H", "H"]
    assert not mf2.restricted
    assert mol2.nelec == (2, 0)
    np.testing.assert_allclose(mf2.mo_coeff[1], mf.mo_coeff[1], atol=1e-12)


def test_ecp_chkfile_vmc_smoke(tmp_path):
    """The one-call workflow from a bare chkfile: VMC("x.chk") runs and the
    Slater energy agrees with the stored SCF within k*SEM — the reference's
    recipes.VMC(dft_checkfile) UX (recipes.py:111-137)."""
    from pyqmc_tpu import recipes

    mol = Molecule("C 0 0 0", basis="ccecpccpvdz", ecp="ccecp", spin=2)
    mf = run_scf(mol)
    chk = str(tmp_path / "c.chk")
    _write_chk(
        chk,
        _mol_json(["C"], mol.atom_coords, "ccecpccpvdz", ecp="ccecp", spin=2),
        scf={
            "e_tot": mf.e_tot,
            # open-shell ROHF layout: 1-D occ in {0, 1, 2}
            "mo_energy": np.asarray(mf.mo_energy[0]),
            "mo_coeff": np.asarray(mf.mo_coeff[0]),
            "mo_occ": np.asarray(mf.mo_occ[0]) + np.asarray(mf.mo_occ[1]),
        },
    )
    data, configs = recipes.VMC(
        chk, nconfig=200, nblocks=10, nsteps_per_block=10, seed=2,
    )
    en = np.asarray([b["energytotal"] for b in data])[3:]
    m, s = en.mean(), en.std(ddof=1) / np.sqrt(len(en))
    # Slater-Jastrow with UNOPTIMIZED (zero) Jastrow = pure Slater: E = HF
    assert abs(m - mf.e_tot) < 6 * max(s, 1e-6), (m, mf.e_tot, s)


def test_casci_checkfile(tmp_path, lih):
    """ci_checkfile: a pyscf mcscf group (dense CI array in pyscf cistring
    order) becomes a multi-determinant expansion wired into a Slater wf."""
    mol, mf = lih
    chk = str(tmp_path / "scf.chk")
    _write_chk(
        chk,
        _mol_json(mol.atom_symbols, mol.atom_coords, "sto-3g"),
        scf={
            "e_tot": mf.e_tot,
            "mo_energy": np.asarray(mf.mo_energy[0]),
            "mo_coeff": np.asarray(mf.mo_coeff[0]),
            "mo_occ": np.asarray(mf.mo_occ[0]) + np.asarray(mf.mo_occ[1]),
        },
    )
    # CAS(2e, 2o) on top of 1 core orbital: dense 2x2 CI array, dominant
    # ground configuration + a double excitation
    ci = np.array([[0.95, 0.0], [0.0, -np.sqrt(1 - 0.95**2)]])
    cichk = str(tmp_path / "casci.chk")
    _write_chk(
        cichk, _mol_json(mol.atom_symbols, mol.atom_coords, "sto-3g"),
        ci_group="mcscf",
        ci_dict={
            "ci": ci,
            "ncas": 2,
            "nelecas": np.array([1, 1]),
            "ncore": 1,
            "mo_coeff": np.asarray(mf.mo_coeff[0]),
            "e_tot": -7.9,
        },
    )
    mol2, mf2, mcs = recover_pyscf(chk, ci_checkfile=cichk)
    assert mcs.ncas == 2 and mcs.nelecas == (1, 1)
    from pyqmc_tpu.system.ci_import import interpret_ci

    exp, coeff = interpret_ci(mcs, tol=1e-6)
    assert len(coeff) == 2  # genuinely multi-determinant
    np.testing.assert_allclose(sorted(np.abs(coeff)),
                               sorted([0.95, np.sqrt(1 - 0.95**2)]))
    from pyqmc_tpu.wftools import generate_slater

    wf = generate_slater(mol2, mf2, mc=mcs)
    assert wf.expansion.map_up.shape[0] == len(coeff)
    # both determinants carry the core orbital 0
    assert all(0 in row for row in wf.expansion.occ_up)


def test_cell_chkfile(tmp_path):
    """Cell JSON: lattice 'a' as a string in angstrom units converts to
    bohr; k-point scf groups raise with guidance."""
    mol = Molecule("H 0 0 0", basis="sto-3g", spin=1)
    chk = str(tmp_path / "cell.chk")
    a_str = "2.0 0 0\n0 2.0 0\n0 0 2.0"
    _write_chk(
        chk,
        _mol_json(["H"], mol.atom_coords, "sto-3g", spin=1, a=a_str,
                  unit="angstrom"),
    )
    cell = read_mol(chk)
    assert cell.lattice is not None
    np.testing.assert_allclose(
        cell.lattice, np.eye(3) * (2.0 / 0.529177210903), rtol=1e-10
    )
    # k-point scf (mo_coeff as __from_list__) -> NotImplementedError
    with h5py.File(chk, "a") as f:
        g = f.create_group("scf")
        lg = g.create_group("mo_coeff__from_list__")
        lg["0"] = np.eye(2)
        g["mo_occ"] = np.array([1.0])
        g["mo_energy"] = np.array([0.0])
        g["e_tot"] = -0.5
    with pytest.raises(NotImplementedError):
        recover_pyscf(chk)
    assert load(chk, "scf")["mo_coeff"][0].shape == (2, 2)


def test_missing_scf_raises(tmp_path):
    chk = str(tmp_path / "empty.chk")
    mol = Molecule("H 0 0 0", basis="sto-3g", spin=1)
    _write_chk(chk, _mol_json(["H"], mol.atom_coords, "sto-3g", spin=1))
    with pytest.raises(ValueError, match="not a pyscf SCF checkpoint"):
        recover_pyscf(chk)
