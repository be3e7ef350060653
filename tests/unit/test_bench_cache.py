"""The committed benchmark SCF checkpoint stays consistent with the code:
loading it must reproduce the recorded converged energy and build a
working wavefunction (the driver's bench/compile gates start from it)."""

import os

import numpy as np
import jax
import h5py

REPO = os.path.join(os.path.dirname(__file__), "..", "..")
CACHE = os.path.join(REPO, "benchmarks", "h2o_ccecp-ccpvdz_ccecp_scf.hdf5")


def test_bench_scf_cache_loads():
    from pyqmc_tpu.system.io import load_system
    from pyqmc_tpu.models.slater import Slater
    from pyqmc_tpu.configs import initial_guess

    assert os.path.exists(CACHE)
    with h5py.File(CACHE, "r") as f:
        mol, mf = load_system(f)
    # ccECP/cc-pVDZ H2O RHF (README correctness anchor)
    np.testing.assert_allclose(mf.e_tot, -16.92653, atol=2e-4)
    assert mol.nelec == (4, 4)
    wf = Slater.from_mean_field(mf)
    params = wf.make_params()
    cfg = initial_guess(mol, 3, key=jax.random.PRNGKey(0))
    st = wf.recompute(params, cfg.positions)
    _, la = wf.value(params, st)
    assert np.all(np.isfinite(np.asarray(la)))
