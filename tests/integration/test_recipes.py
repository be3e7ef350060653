"""High-level recipes: OPTIMIZE -> save -> VMC(load) -> read output."""

import numpy as np
import jax
import pytest

from pyqmc_tpu.api import Molecule, OPTIMIZE, VMC, DMC, read_mc_output


def test_optimize_then_vmc_roundtrip(tmp_path):
    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")
    opt_file = str(tmp_path / "opt.h5")
    wf, params, records = OPTIMIZE(
        mol, output=opt_file, nconfig=300, max_iterations=4, vmc_blocks=4,
    )
    assert len(records) == 4
    vmc_file = str(tmp_path / "vmc.h5")
    data, configs = VMC(
        mol, output=vmc_file, load_parameters=opt_file, nconfig=300,
        nblocks=10, seed=5,
    )
    out = read_mc_output(vmc_file, warmup=3)
    assert "energytotal" in out and "energytotal_err" in out
    # optimized SJ energy must be at or below HF (-1.1167) within 4 sigma
    assert out["energytotal"] < -1.1167 + 4 * out["energytotal_err"]


def test_dmc_recipe(tmp_path):
    mol = Molecule("H 0 0 0", basis="ccpvdz", spin=1)
    f = str(tmp_path / "dmc.h5")
    data, configs, weights = DMC(
        mol, output=f, nconfig=200, nblocks=10, nsteps_per_block=10,
        warmup_vmc_blocks=2,
    )
    out = read_mc_output(f, warmup=4)
    assert np.isfinite(out["energytotal"])
