"""Standalone CASCI: exact dissociation physics + VMC on the CI expansion."""

import numpy as np
import jax
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.system.casci import run_casci
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.method.vmc import vmc
from pyqmc_tpu.configs import initial_guess


def test_h2_casci_matches_fci():
    """H2/STO-3G (2e,2o) CASCI is full CI: known energy ~ -1.13728 at R=1.4."""
    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")
    mf = run_scf(mol)
    energies, roots = run_casci(mf, ncas=2, nelecas=(1, 1), nroots=3)
    # literature FCI/STO-3G at R=1.4: -1.13728
    assert abs(energies[0] - (-1.13728)) < 2e-4, energies
    # correlation lowers below HF
    assert energies[0] < mf.e_tot - 0.015


def test_h2_stretched_multireference():
    """At large R, HF fails catastrophically; CASCI gives ~ 2 H atoms."""
    mol = Molecule("H 0 0 0; H 0 0 5.0", basis="sto-3g")
    mf = run_scf(mol)
    energies, roots = run_casci(mf, ncas=2, nelecas=(1, 1))
    # two isolated H atoms in STO-3G: 2 x (-0.46658) = -0.93317
    assert abs(energies[0] - (-0.9333)) < 5e-3, energies
    exp, coeff = roots[0]
    # strongly multireference: two determinants with near-equal weight
    c = np.abs(coeff) / np.linalg.norm(coeff)
    assert np.sum(c > 0.3) >= 2, coeff


def test_vmc_on_casci_wf():
    """VMC(multi-det CASCI wavefunction) reproduces the CASCI energy."""
    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")
    mf = run_scf(mol)
    energies, roots = run_casci(mf, ncas=2, nelecas=(1, 1))
    exp, coeff = roots[0]
    norb = int(max(exp.occ_up.max(), exp.occ_dn.max())) + 1
    ca = mf.mo_coeff[0][:, :norb]
    wf = Slater(mol, None, exp, (ca, ca), det_coeff=coeff)
    configs = initial_guess(mol, 800, key=jax.random.PRNGKey(0))
    data, _ = vmc(
        wf, wf.make_params(), configs, nblocks=25, nsteps_per_block=10,
        accumulators={"energy": EnergyAccumulator(mol)},
        key=jax.random.PRNGKey(1),
    )
    en = np.array([d["energytotal"] for d in data[8:]])
    mean, sem = en.mean(), en.std(ddof=1) / np.sqrt(len(en))
    assert abs(mean - energies[0]) < 5 * max(sem, 5e-4), (mean, energies[0], sem)


def test_hci_selected_ci():
    """HCI: eps->0 recovers CASCI; finite eps selects fewer determinants
    variationally above it (pyscftools.deters_from_hci parity, standalone)."""
    from pyqmc_tpu.system.casci import run_hci

    mol = Molecule("Li 0 0 0; H 0 0 3.015", basis="sto-3g")
    mf = run_scf(mol)
    e_cas, _ = run_casci(mf, ncas=4, nelecas=(1, 1))
    e_tight, roots_tight = run_hci(mf, ncas=4, nelecas=(1, 1), eps1=1e-9)
    e_loose, roots_loose = run_hci(mf, ncas=4, nelecas=(1, 1), eps1=5e-3)
    assert abs(e_tight[0] - e_cas[0]) < 1e-8
    assert e_loose[0] >= e_cas[0] - 1e-10
    assert len(roots_loose[0][1]) < len(roots_tight[0][1])
