"""Twist averaging over the primitive Li cell (S = identity: the 2x2x2
primitive mesh splits into 8 distinct twists)."""

import numpy as np
import jax
import pytest

from ..fixtures_pbc import load_cell
from pyqmc_tpu.system.supercell import get_supercell, create_supercell_twists
from pyqmc_tpu.method.twist_average import twist_average_vmc, build_twist_wf
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.configs import initial_guess


def test_twist_average_li():
    cell, d = load_cell("li_cubic_ccecp")
    sup = get_supercell(cell, np.eye(3, dtype=int))  # primitive "supercell"
    kpts = np.asarray(d["kpts"])
    twists = create_supercell_twists(sup, kpts)
    assert len(twists) == 8  # every mesh point is its own twist
    mo = ([np.asarray(d["mo_coeff"][k]) for k in range(8)],) * 2
    occ = ([np.asarray(d["mo_occ"][k]) / 2.0 for k in range(8)],) * 2

    def cfg_factory(ti):
        return initial_guess(sup, 60, key=jax.random.PRNGKey(100 + ti))

    records, avg = twist_average_vmc(
        cell, sup, kpts, mo, occ, cfg_factory,
        key=jax.random.PRNGKey(0),
        accumulators_factory=lambda: {"energy": EnergyAccumulator(sup)},
        nblocks=4, nsteps_per_block=5, tstep=1.0,
    )
    assert len(records) == 8
    assert np.isfinite(avg["energytotal"])
    # per-twist energies differ (finite-size shell effects) but all finite
    per_twist = [
        np.mean([b["energytotal"] for b in r["data"][1:]]) for r in records
    ]
    assert np.all(np.isfinite(per_twist))
    # every twist is a TRIM point here: wavefunctions ran in real mode
    wf = build_twist_wf(cell, sup, kpts, mo, occ, list(twists.values())[3])
    assert wf.orbitals.real_mode
