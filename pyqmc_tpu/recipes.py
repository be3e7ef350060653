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


def _resolve_system(mol, mf=None, ci_checkfile=None):
    """Accept a Molecule/Cell (+ optional MeanField) or a pyscf chkfile
    path — the reference's `dft_checkfile` front door
    (recipes.py:31-47 via pyscftools.recover_pyscf). Returns (mol, mf, mc)
    with mc a CASCI/HCI namespace (or None) for generate_wf(mc=...)."""
    mc = None
    if isinstance(mol, str):
        from .system.chkfile import recover_pyscf

        if mf is not None:
            raise ValueError(
                "pass either a chkfile path or an explicit MeanField, "
                "not both"
            )
        out = recover_pyscf(mol, ci_checkfile=ci_checkfile)
        mol, mf = out[0], out[1]
        if len(out) > 2:
            mc = out[2]
    elif ci_checkfile is not None:
        from .system.chkfile import load, _mc_shim

        casdict = load(ci_checkfile, "ci") or load(ci_checkfile, "mcscf")
        if casdict is None:
            raise ValueError(
                f"{ci_checkfile}: neither 'ci' nor 'mcscf' group present"
            )
        mc = _mc_shim(casdict)
    return mol, mf, mc


def _setup(mol, mf=None, nconfig=500, jastrow3=False, jastrow_kws=None,
           seed=0, naip=None, ci_checkfile=None):
    # naip=None keeps the accumulator's per-atom 12/6 reference default
    # (eval_ecp.py:239-240); pass an int to pin the quadrature grid.
    mol, mf, mc = _resolve_system(mol, mf, ci_checkfile)
    if mf is None:
        mf = run_scf(mol)
    wf, params, to_opt = generate_wf(
        mol, mf, jastrow3=jastrow3, jastrow_kws=jastrow_kws, mc=mc
    )
    configs = initial_guess(mol, nconfig, key=jax.random.PRNGKey(seed))
    ecp_acc = ECPAccumulator(mol, naip=naip) if getattr(mol, "ecp", None) else None
    energy = EnergyAccumulator(mol, ecp_acc=ecp_acc)
    return mol, mf, wf, params, to_opt, configs, energy


def _slater_orbitals(wf):
    """The orbital evaluator of the Slater factor of a (possibly composite)
    recipe wavefunction."""
    base = wf.wfs[0] if hasattr(wf, "wfs") else wf
    return base.orbitals


def generate_accumulators(
    mol, mf, wf=None, energy=True, rdm1=False, sq=False,
    extra_accumulators=None, naip=None, sq_qlist=None, aux_sigma=1.5,
):
    """Observable-accumulator factory (reference recipes.py:68-108 parity).

    Selected by plain kwargs: `energy` wires the full local-energy
    accumulator (auto-ECP), `rdm1` the one-body density matrix per spin
    (molecular OBDM in the SCF MO basis; periodic KOBDM in the wavefunction's
    twist-resolved k-point MO basis — requires `wf`), `sq` the charge/spin
    structure factor (periodic cells use the reciprocal-lattice grid;
    molecules must pass `sq_qlist`). `extra_accumulators` are merged in;
    name collisions with generated ones raise.
    """
    from .observables.obdm import OBDMAccumulator, KOBDMAccumulator
    from .observables.sq import SqAccumulator

    acc = {} if extra_accumulators is None else dict(extra_accumulators)
    periodic = getattr(mol, "lattice", None) is not None

    def _claim(name):
        if name in acc:
            raise ValueError(
                f"accumulator name '{name}' appears in extra_accumulators "
                "and is also requested by flag"
            )

    if energy:
        _claim("energy")
        ecp_acc = (
            ECPAccumulator(mol, naip=naip) if getattr(mol, "ecp", None) else None
        )
        acc["energy"] = EnergyAccumulator(mol, ecp_acc=ecp_acc)
    if rdm1:
        _claim("rdm1_up")
        _claim("rdm1_down")
        if periodic:
            if wf is None:
                raise ValueError(
                    "periodic rdm1 needs `wf` to reuse its twist-resolved "
                    "k-point orbital evaluator"
                )
            orb = _slater_orbitals(wf)
            acc["rdm1_up"] = KOBDMAccumulator(mol, orb, spin=0,
                                              aux_sigma=aux_sigma)
            acc["rdm1_down"] = KOBDMAccumulator(mol, orb, spin=1,
                                                aux_sigma=aux_sigma)
        else:
            ca, cb = mf.mo_coeff
            acc["rdm1_up"] = OBDMAccumulator(mol, ca, spin=0,
                                             aux_sigma=aux_sigma)
            acc["rdm1_down"] = OBDMAccumulator(mol, cb, spin=1,
                                               aux_sigma=aux_sigma)
    if sq:
        _claim("sq")
        if periodic:
            acc["sq"] = SqAccumulator(mol)
        elif sq_qlist is not None:
            acc["sq"] = SqAccumulator(qlist=sq_qlist)
        else:
            raise ValueError(
                "sq=True on an open system needs an explicit sq_qlist"
            )
    return acc


def _resolve_accumulators(mol, mf, wf, accumulators, naip=None):
    """VMC/DMC `accumulators` argument: either a dict of ready accumulator
    objects (merged with the default energy accumulator) or a dict of
    generate_accumulators kwargs, reference-style
    (e.g. accumulators={"rdm1": True})."""
    if not accumulators:
        return {}
    if all(hasattr(v, "avg") for v in accumulators.values()):
        return dict(accumulators)
    return generate_accumulators(
        mol, mf, wf=wf, energy=False, naip=naip, **accumulators
    )


def OPTIMIZE(
    mol, output: Optional[str] = None, mf=None, nconfig=500, max_iterations=15,
    jastrow3=False, jastrow_kws=None, naip=None, seed=0, verbose=False,
    ci_checkfile=None,
    **linemin_kws,
):
    """Optimize a Slater-Jastrow wf; returns (wf, params, records).

    `mol` may be a Molecule/Cell or a pyscf chkfile path (the reference's
    `OPTIMIZE(dft_checkfile, ...)` workflow, recipes.py:31-47);
    `ci_checkfile` adds a CASCI/HCI determinant expansion."""
    mol, mf, wf, params, to_opt, configs, energy = _setup(
        mol, mf, nconfig, jastrow3, jastrow_kws, seed, naip, ci_checkfile
    )
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
    load_parameters: Optional[str] = None, jastrow3=False, jastrow_kws=None,
    naip=None, seed=0, mesh=None, verbose=False, ci_checkfile=None,
):
    """Run VMC; returns (block data, configs).

    accumulators: ready accumulator objects ({"sq": SqAccumulator(...)}) or
    generate_accumulators kwargs ({"rdm1": True}), merged with the energy
    accumulator. jastrow3/jastrow_kws must match the OPTIMIZE call that
    produced `load_parameters` so the parameter pytree round-trips.
    `mol` may be a Molecule/Cell or a pyscf chkfile path.
    """
    mol, mf, wf, params0, to_opt, configs, energy = _setup(
        mol, mf, nconfig, jastrow3, jastrow_kws, seed, naip, ci_checkfile
    )
    if params is None:
        params = params0
    if load_parameters is not None:
        import h5py

        with h5py.File(load_parameters, "r") as f:
            params = read_wf_params(f["wf"], params0)
    accs = {"energy": energy}
    accs.update(_resolve_accumulators(mol, mf, wf, accumulators, naip=naip))
    data, configs = vmc(
        wf, params, configs, nblocks=nblocks, nsteps_per_block=nsteps_per_block,
        tstep=tstep, accumulators=accs, key=jax.random.PRNGKey(seed + 3),
        hdf_file=output, mesh=mesh, verbose=verbose,
    )
    return data, configs


def DMC(
    mol, output: Optional[str] = None, mf=None, params=None, nconfig=500,
    nblocks=100, nsteps_per_block=10, tstep=0.02, accumulators=None,
    load_parameters: Optional[str] = None, jastrow3=False, jastrow_kws=None,
    naip=None, seed=0, mesh=None, verbose=False, ci_checkfile=None,
    **dmc_kws,
):
    """Run DMC; `mol` may be a Molecule/Cell or a pyscf chkfile path."""
    mol, mf, wf, params0, to_opt, configs, energy = _setup(
        mol, mf, nconfig, jastrow3, jastrow_kws, seed, naip, ci_checkfile
    )
    if params is None:
        params = params0
    if load_parameters is not None:
        import h5py

        with h5py.File(load_parameters, "r") as f:
            params = read_wf_params(f["wf"], params0)
    extra = _resolve_accumulators(mol, mf, wf, accumulators, naip=naip)
    if extra:
        dmc_kws["accumulators"] = {**dmc_kws.get("accumulators", {}), **extra}
    data, configs, weights = rundmc(
        wf, params, configs, nblocks=nblocks, nsteps_per_block=nsteps_per_block,
        tstep=tstep, energy_acc=energy, key=jax.random.PRNGKey(seed + 4),
        hdf_file=output, mesh=mesh, verbose=verbose, **dmc_kws,
    )
    return data, configs, weights


def read_mc_output(filename, warmup=5, reblocks=16, weights="auto"):
    """Summarize a VMC/DMC HDF5 output (recipes.py:224-239).

    weights: "auto" (default) weights DMC block observables by the block's
    mean walker weight (the per-block "weight" dataset rundmc streams) —
    population weights make equal-weight averages biased; None forces the
    unweighted analysis; or an explicit (nblocks,) array."""
    import h5py

    out = {}
    with h5py.File(filename, "r") as f:
        w = None
        if isinstance(weights, str) and weights == "auto":
            if "weight" in f:
                w = np.asarray(f["weight"])[warmup:]
        elif weights is not None:
            w = np.asarray(weights)[warmup:]
        for k in f.keys():
            if k in ("configs", "wf", "weights"):
                continue
            data = np.asarray(f[k])[warmup:]
            if np.issubdtype(data.dtype, np.number) and len(data) >= 2:
                # scalars AND array-valued observables (S(q), density
                # matrices): reblock_summary reduces along the block axis
                # elementwise. The weight stream itself stays unweighted.
                wk = None if k in ("weight", "block") else w
                s = rb.reblock_summary(
                    data, min(reblocks, max(2, len(data) // 2)), weights=wk
                )
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
