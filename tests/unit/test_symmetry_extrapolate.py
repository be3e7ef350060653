"""Symmetry accumulator + timestep extrapolation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.observables.symmetry import SymmetryAccumulator
from pyqmc_tpu.method.extrapolate import tstep_extrapolate
from pyqmc_tpu.configs import initial_guess


def test_symmetry_h2():
    """H2 sigma_g ground state: even under inversion about the bond center
    (<S> = +1), for every walker (deterministic identity, not statistical)."""
    mol = Molecule("H 0 0 -0.7; H 0 0 0.7", basis="sto-3g")
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    params = wf.make_params()
    configs = initial_guess(mol, 50, key=jax.random.PRNGKey(0))
    state = wf.recompute(params, configs.positions)
    acc = SymmetryAccumulator(
        mol, [-np.eye(3), np.diag([1.0, 1.0, -1.0])], names=["inversion", "sigma_h"]
    )
    out = acc(wf, params, state, configs.positions)
    np.testing.assert_allclose(np.asarray(out["inversion"]), 1.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out["sigma_h"]), 1.0, atol=1e-10)


def test_symmetry_odd_orbital():
    """A single p_z electron is odd under z-mirror: <sigma_h> = -1."""
    mol = Molecule("H 0 0 0", basis={"H": [[1, [0.8, 1.0]]]}, spin=1)
    from pyqmc_tpu.models.slater import DeterminantExpansion

    C = np.zeros((3, 1))
    C[2, 0] = 1.0  # p ordered (x, y, z)
    wf = Slater(mol, None, DeterminantExpansion.single(1, 0), (C, np.zeros((3, 0))))
    params = wf.make_params()
    configs = initial_guess(mol, 20, key=jax.random.PRNGKey(1))
    state = wf.recompute(params, configs.positions)
    acc = SymmetryAccumulator(mol, [np.diag([1.0, 1.0, -1.0])], names=["sz"])
    out = acc(wf, params, state, configs.positions)
    np.testing.assert_allclose(np.asarray(out["sz"]), -1.0, atol=1e-10)


def test_tstep_extrapolation():
    rng = np.random.default_rng(0)
    taus = np.array([0.08, 0.04, 0.02, 0.01])
    true = -1.17
    slope = 0.5
    errs = np.full(4, 0.001)
    es = true + slope * taus + rng.normal(scale=errs)
    e0, e0err, coeffs = tstep_extrapolate(taus, es, errs)
    assert abs(e0 - true) < 4 * e0err
    assert abs(coeffs[1] - slope) < 0.2
