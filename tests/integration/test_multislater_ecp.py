"""BASELINE config 3: multi-Slater (CASCI) x three-body Jastrow with ECP
quadrature, fully standalone."""

import numpy as np
import jax
import pytest

from pyqmc_tpu.api import (
    Molecule, run_scf, Slater, EnergyAccumulator, ECPAccumulator,
    ThreeBodyJastrow, MultiplyWF, vmc, initial_guess, run_casci,
)


@pytest.mark.slow
def test_casci_j3_ecp_vmc():
    """VMC over a CASCI multi-determinant wf (ECP Hamiltonian) with an
    (identity-initialized) three-body Jastrow reproduces the CASCI energy."""
    mol = Molecule("C 0 0 0", basis="ccecpccpvdz", ecp="ccecp", spin=2)
    mf = run_scf(mol)
    energies, roots = run_casci(mf, ncas=4, nelecas=(3, 1))
    exp, coeff = roots[0]
    assert energies[0] < mf.e_tot - 1e-3  # static correlation captured
    norb = int(max(exp.occ_up.max(), exp.occ_dn.max())) + 1
    ca = mf.mo_coeff[0][:, :norb]
    slater = Slater(mol, None, exp, (ca, ca), det_coeff=coeff)
    j3 = ThreeBodyJastrow(mol)
    wf = MultiplyWF(slater, j3)
    params = wf.make_params()  # J3 coefficients zero -> exp(0) = identity
    acc = {"energy": EnergyAccumulator(mol, ecp_acc=ECPAccumulator(mol, naip=6))}
    configs = initial_guess(mol, 600, key=jax.random.PRNGKey(0))
    data, _ = vmc(
        wf, params, configs, nblocks=30, nsteps_per_block=10, tstep=0.6,
        accumulators=acc, key=jax.random.PRNGKey(1),
    )
    en = np.array([d["energytotal"] for d in data[10:]])
    mean, sem = en.mean(), en.std(ddof=1) / np.sqrt(len(en))
    assert abs(mean - energies[0]) < 5 * max(sem, 1e-3), (mean, energies[0], sem)


def test_embedded_fixed_phase_dmc_smoke():
    """Fixed-phase DMC with the general-twist embedded determinant: the
    ratio is a modulus (never negative), so the fixed-node rejection is a
    no-op and the sampler performs fixed-phase DMC automatically."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from fixtures_pbc import load_cell
    from pyqmc_tpu.system.supercell import get_supercell
    from pyqmc_tpu.models.orbitals import KPointOrbitals
    from pyqmc_tpu.models.slater_embedded import EmbeddedKSlater
    from pyqmc_tpu.method.dmc import rundmc

    cell, d = load_cell("li_cubic_ccecp")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    kpts = np.asarray(d["kpts"]) + np.array([0.021, -0.013, 0.037])
    blocks = [np.asarray(d["mo_coeff"][k])[:, :1] for k in range(8)]
    orb = KPointOrbitals(cell, kpts, (blocks, blocks), realify=False)
    wf = EmbeddedKSlater(sup, orb)
    acc = EnergyAccumulator(sup, ecp_acc=ECPAccumulator(sup, naip=6))
    configs = initial_guess(sup, 24, key=jax.random.PRNGKey(2))
    data, _, w = rundmc(
        wf, wf.make_params(), configs, nblocks=3, nsteps_per_block=3,
        tstep=0.05, energy_acc=acc, key=jax.random.PRNGKey(3),
        warmup_vmc_blocks=2,
    )
    assert np.all(np.isfinite([x["energytotal"] for x in data]))
    assert np.all(np.isfinite(w))
