"""Integrals + SCF against analytic/literature values.

These anchor the whole front-end: if HF energies match published numbers, the
integrals, normalization, and solid-harmonic conventions are all consistent.
"""

import numpy as np
import pytest

from pyqmc_tpu.system import integrals
from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf


def test_overlap_identity_single_gauss():
    mol = Molecule("H 0 0 0", basis={"H": [[0, [0.5, 1.0]], [1, [0.3, 1.0]], [2, [0.8, 1.0]]]}, spin=1)
    S, T = integrals.overlap_kinetic(mol)
    np.testing.assert_allclose(np.diag(S), 1.0, rtol=1e-12)
    # kinetic energy of normalized gaussian: T = alpha * (2l + 3) / 2... check s:
    # <T> for s gaussian with exponent a is 3a/2
    np.testing.assert_allclose(T[0, 0], 3 * 0.5 / 2, rtol=1e-12)


def test_nuclear_single_s():
    # <V> for normalized s gaussian exponent a at nucleus: -Z * 2 sqrt(a) * sqrt(2/pi)
    a = 0.7
    mol = Molecule("H 0 0 0", basis={"H": [[0, [a, 1.0]]]}, spin=1)
    V = integrals.nuclear(mol)
    np.testing.assert_allclose(V[0, 0], -2.0 * np.sqrt(2.0 * a / np.pi), rtol=1e-12)


def test_eri_single_s():
    # analytic self-repulsion of a normalized s gaussian: (ss|ss) = 2 sqrt(a/pi)
    a = 0.9
    mol = Molecule("H 0 0 0", basis={"H": [[0, [a, 1.0]]]}, spin=1)
    E = integrals.eri(mol)
    np.testing.assert_allclose(E[0, 0, 0, 0], 2.0 * np.sqrt(a / np.pi), rtol=1e-10)


def test_h2_sto3g():
    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")
    mf = run_scf(mol)
    # textbook value (Szabo & Ostlund): E_RHF(H2, R=1.4, STO-3G) = -1.1167 Ha
    assert abs(mf.e_tot - (-1.11675)) < 2e-4


def test_he_sto3g():
    mf = run_scf(Molecule("He 0 0 0", basis="sto-3g"))
    assert abs(mf.e_tot - (-2.80778)) < 5e-4


def test_h2o_sto3g():
    # standard near-equilibrium geometry; literature E ~= -74.963 Ha
    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867", basis="sto-3g"
    )
    mf = run_scf(mol)
    assert abs(mf.e_tot - (-74.963)) < 5e-3


def test_uhf_h_atom():
    mf = run_scf(Molecule("H 0 0 0", basis="ccpvdz", spin=1))
    # HF limit for H atom is -0.5; cc-pVDZ gives ~ -0.4993
    assert abs(mf.e_tot - (-0.4993)) < 1e-3


def test_uhf_li_ccecp():
    # ECP SCF not implemented; just check all-electron Li sto-3g UHF runs
    mf = run_scf(Molecule("Li 0 0 0", basis="sto-3g", spin=1))
    assert abs(mf.e_tot - (-7.3155)) < 5e-3


@pytest.mark.slow
def test_ccecp_pseudo_atoms():
    """ccECP H/O entries: validated against exact ionic levels (see
    basis.py comments); pseudo-atom UHF values recorded here.
    Full pipeline check: ccECP H2O SJ-DMC extrapolated gives
    -17.256(18) Ha (run offline; published ccECP-quality ~ -17.25)."""
    mf_h = run_scf(Molecule("H 0 0 0", basis="ccecpccpvdz", ecp="ccecp", spin=1))
    assert abs(mf_h.e_tot - (-0.50574)) < 1e-3
    mf_o = run_scf(Molecule("O 0 0 0", basis="ccecpccpvdz", ecp="ccecp", spin=2))
    assert abs(mf_o.e_tot - (-15.6694)) < 5e-3
    mf_w = run_scf(Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
        basis="ccecpccpvdz", ecp="ccecp",
    ))
    assert abs(mf_w.e_tot - (-16.9292)) < 5e-3
