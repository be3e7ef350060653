"""One-call workflows (port of pyqmc/recipes.py:31-239).

The reference starts from PySCF HDF5 checkpoints; standalone, these recipes
start from a Molecule/Cell (+ optionally a precomputed MeanField) and handle
wf construction, optimization, sampling and HDF5 output.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax

from .system.scf import run_scf
from .wftools import generate_wf, save_wf_params, read_wf_params
from .observables.accumulators import EnergyAccumulator
from .observables.ecp import ECPAccumulator
from .observables.transform import LinearTransform
from .method.vmc import vmc
from .method.dmc import rundmc
from .method.linemin import line_minimization
from .configs import initial_guess
from . import reblock as rb


def _setup(mol, mf=None, nconfig=500, jastrow3=False, seed=0, naip=6):
    if mf is None:
        mf = run_scf(mol)
    wf, params, to_opt = generate_wf(mol, mf, jastrow3=jastrow3)
    configs = initial_guess(mol, nconfig, key=jax.random.PRNGKey(seed))
    ecp_acc = ECPAccumulator(mol, naip=naip) if getattr(mol, "ecp", None) else None
    energy = EnergyAccumulator(mol, ecp_acc=ecp_acc)
    return mf, wf, params, to_opt, configs, energy


def OPTIMIZE(
    mol, output: Optional[str] = None, mf=None, nconfig=500, max_iterations=15,
    jastrow3=False, seed=0, verbose=False, **linemin_kws,
):
    """Optimize a Slater-Jastrow wf; returns (wf, params, records)."""
    mf, wf, params, to_opt, configs, energy = _setup(mol, mf, nconfig, jastrow3, seed)
    lt = LinearTransform(params, to_opt)
    _, configs = vmc(
        wf, params, configs, nblocks=4, nsteps_per_block=10,
        key=jax.random.PRNGKey(seed + 1),
    )
    params, configs, records = line_minimization(
        wf, params, configs, lt, energy, key=jax.random.PRNGKey(seed + 2),
        max_iterations=max_iterations, hdf_file=output, verbose=verbose,
        **linemin_kws,
    )
    if output is not None:
        import h5py

        with h5py.File(output, "a") as f:
            save_wf_params(f.require_group("wf"), params)
    return wf, params, records


def VMC(
    mol, output: Optional[str] = None, mf=None, params=None, nconfig=500,
    nblocks=50, nsteps_per_block=10, tstep=0.5, accumulators=None,
    load_parameters: Optional[str] = None, seed=0, mesh=None, verbose=False,
):
    """Run VMC; returns (block data, configs)."""
    mf, wf, params0, to_opt, configs, energy = _setup(mol, mf, nconfig, seed=seed)
    if params is None:
        params = params0
    if load_parameters is not None:
        import h5py

        with h5py.File(load_parameters, "r") as f:
            params = read_wf_params(f["wf"], params0)
    accs = {"energy": energy}
    accs.update(accumulators or {})
    data, configs = vmc(
        wf, params, configs, nblocks=nblocks, nsteps_per_block=nsteps_per_block,
        tstep=tstep, accumulators=accs, key=jax.random.PRNGKey(seed + 3),
        hdf_file=output, mesh=mesh, verbose=verbose,
    )
    return data, configs


def DMC(
    mol, output: Optional[str] = None, mf=None, params=None, nconfig=500,
    nblocks=100, nsteps_per_block=10, tstep=0.02,
    load_parameters: Optional[str] = None, seed=0, mesh=None, verbose=False,
    **dmc_kws,
):
    mf, wf, params0, to_opt, configs, energy = _setup(mol, mf, nconfig, seed=seed)
    if params is None:
        params = params0
    if load_parameters is not None:
        import h5py

        with h5py.File(load_parameters, "r") as f:
            params = read_wf_params(f["wf"], params0)
    data, configs, weights = rundmc(
        wf, params, configs, nblocks=nblocks, nsteps_per_block=nsteps_per_block,
        tstep=tstep, energy_acc=energy, key=jax.random.PRNGKey(seed + 4),
        hdf_file=output, mesh=mesh, verbose=verbose, **dmc_kws,
    )
    return data, configs, weights


def read_mc_output(filename, warmup=5, reblocks=16):
    """Summarize a VMC/DMC HDF5 output (recipes.py:224-239)."""
    import h5py

    out = {}
    with h5py.File(filename, "r") as f:
        for k in f.keys():
            if k in ("configs", "wf", "weights"):
                continue
            data = np.asarray(f[k])[warmup:]
            if np.issubdtype(data.dtype, np.number) and len(data) >= 2:
                # scalars AND array-valued observables (S(q), density
                # matrices): reblock_summary reduces along the block axis
                # elementwise
                s = rb.reblock_summary(data, min(reblocks, max(2, len(data) // 2)))
                out[k] = s["mean"]
                out[k + "_err"] = s["standard error"]
    return out


def read_opt(filename):
    """Summarize an optimization HDF5 output (recipes.py:212 parity)."""
    import h5py

    out = {}
    with h5py.File(filename, "r") as f:
        for k in ("energy", "energy_err", "gnorm", "tau"):
            if k in f:
                out[k] = np.asarray(f[k])
    return out
