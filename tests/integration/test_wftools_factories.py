"""Factory parity: GPS / geminal Jastrow factories through generate_wf and
superposition wavefunctions read from HDF5 (reference wftools.py:165-307)."""

import h5py
import numpy as np
import jax
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu import wftools
from pyqmc_tpu.configs import initial_guess
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.observables.transform import LinearTransform
from pyqmc_tpu.method.vmc import vmc


@pytest.fixture(scope="module")
def h2():
    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")
    mf = run_scf(mol)
    return mol, mf


@pytest.mark.parametrize(
    "factory,kws",
    [
        (wftools.generate_gps_jastrow, {"n_support": 3, "seed": 1}),
        (wftools.generate_geminal_jastrow, {}),
    ],
)
def test_jastrow_factory_vmc(h2, factory, kws):
    mol, mf = h2
    wf, params, to_opt = wftools.generate_wf(
        mol, mf, jastrow=factory, jastrow_kws=kws
    )
    lt = LinearTransform(params, to_opt)
    assert lt.nparams > 0
    # serialize/deserialize roundtrip through the optimizable subspace
    flat = lt.serialize(params)
    np.testing.assert_allclose(
        np.asarray(lt.serialize(lt.deserialize(params, flat))),
        np.asarray(flat),
    )
    configs = initial_guess(mol, 32, key=jax.random.PRNGKey(0))
    data, _ = vmc(
        wf, params, configs, nblocks=2, nsteps_per_block=4, tstep=0.6,
        accumulators={"energy": EnergyAccumulator(mol)},
        key=jax.random.PRNGKey(1),
    )
    assert np.isfinite(data[-1]["energytotal"])


def test_read_superposition(h2, tmp_path):
    mol, mf = h2
    files = []
    params_saved = []
    for i, scale in enumerate((0.0, -0.25)):
        wf, params, _ = wftools.generate_wf(mol, mf)
        # perturb the Jastrow so the two components differ
        params["wf1"]["acoeff"] = params["wf1"]["acoeff"] + scale
        fname = str(tmp_path / f"wf{i}.h5")
        with h5py.File(fname, "w") as f:
            wftools.save_wf_params(f.require_group("wf"), params)
        files.append(fname)
        params_saved.append(params)

    coeffs = np.array([0.8, 0.6])
    wf, params, to_opt = wftools.read_superposition(mol, mf, files, coeffs)
    np.testing.assert_allclose(np.asarray(params["coeff"]), coeffs)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(params[f"wf{i}"]["wf1"]["acoeff"]),
            np.asarray(params_saved[i]["wf1"]["acoeff"]),
        )
    configs = initial_guess(mol, 16, key=jax.random.PRNGKey(2))
    state = wf.recompute(params, configs.positions)
    _, la = wf.value(params, state)
    assert np.all(np.isfinite(np.asarray(la)))
    # superposition must differ from either component alone
    wf0, p0, _ = wftools.generate_wf(mol, mf)
    p0 = params["wf0"]
    st0 = wf0.recompute(p0, configs.positions)
    _, la0 = wf0.value(p0, st0)
    assert not np.allclose(np.asarray(la), np.asarray(la0))
    # VMC smoke on the superposition
    data, _ = vmc(
        wf, params, configs, nblocks=2, nsteps_per_block=4, tstep=0.6,
        accumulators={"energy": EnergyAccumulator(mol)},
        key=jax.random.PRNGKey(3),
    )
    assert np.isfinite(data[-1]["energytotal"])
