"""Wavefunction optimization: SR direction + correlated-sampling line search.

Port of pyqmc/method/linemin.py:102-409. Outer loop on the host; the three
inner engines (VMC-with-SR-accumulator, the SR solve, correlated sampling
over candidate parameter sets) are jit-compiled.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .vmc import vmc, make_vmc_block
from ..observables.sr import StochasticReconfiguration


def make_correlated_sampler(wf, energy_acc, geometry):
    """Returns jitted f(params, positions, key) -> (logabs, eloc)."""

    def f(params, positions, key):
        state = wf.recompute(params, positions)
        _, logabs = wf.value(params, state)
        eloc = energy_acc(wf, params, state, positions, key=key)["total"]
        return logabs, eloc

    return jax.jit(f)


def correlated_energies(sampler, params0, candidates, positions, key):
    """Correlated-sampling energies of candidate parameter sets
    (linemin.py:288-409 semantics, reference-distribution |psi_0|^2).

    Returns (energies, ess): candidates whose importance weights have a low
    effective sample size produce unreliable estimates (observed: apparent
    energies far below the exact ground state); callers should filter on ess.
    """
    la0, _ = sampler(params0, positions, key)
    out, esses = [], []
    n = positions.shape[0]
    for cand in candidates:
        la, eloc = sampler(cand, positions, key)
        w = jnp.exp(2.0 * (la - la0))
        w = w / jnp.mean(w)
        e = jnp.mean(w * eloc) / jnp.mean(w)
        ess = float(jnp.sum(w) ** 2 / (jnp.sum(w * w) * n))
        out.append(float(e))
        esses.append(ess)
    return np.asarray(out), np.asarray(esses)


def line_minimization(
    wf,
    params,
    configs,
    transform,
    energy_acc,
    key=None,
    max_iterations: int = 20,
    taus: Sequence[float] = (0.0, 0.02, 0.05, 0.1, 0.2, 0.4),
    vmc_blocks: int = 10,
    vmc_steps_per_block: int = 10,
    vmc_tstep: float = 0.5,
    correlated_nconf: Optional[int] = None,
    sr_eps: float = 1e-3,
    mesh=None,
    hdf_file: Optional[str] = None,
    verbose: bool = False,
):
    """Optimize params; returns (params, configs, iteration records).

    Restartable (cf. reference linemin.py:162-189): when `hdf_file` already
    holds completed iterations, resume from the recorded parameter vector,
    walker configurations, and iteration counter instead of starting over.
    Per-iteration RNG keys are derived by folding the iteration index so a
    resumed run draws the same stream it would have drawn uninterrupted.
    """
    if key is None:
        key = jax.random.PRNGKey(int(time.time() * 1e6) % (2**31))
    sr = StochasticReconfiguration(energy_acc, transform, eps=sr_eps)
    sampler = make_correlated_sampler(wf, energy_acc, configs.geometry)
    block_fn = make_vmc_block(
        wf, {"pgrad": sr}, configs.geometry, tstep=vmc_tstep,
        nsteps=vmc_steps_per_block, mesh=mesh,
    )

    start_it = 0
    records = []
    if hdf_file is not None:
        import os
        import h5py
        from ..configs import Configs

        if os.path.exists(hdf_file):
            with h5py.File(hdf_file, "r") as f:
                if "x" in f and len(f["x"]) > 0:
                    start_it = len(f["x"])
                    params = transform.deserialize(
                        params, jnp.asarray(np.asarray(f["x"])[-1])
                    )
                    if "configs" in f:
                        configs = Configs.from_hdf(f["configs"])
                    if verbose:
                        print(
                            f"linemin: resuming at iteration {start_it} "
                            f"from {hdf_file}", flush=True,
                        )

    for it in range(start_it, max_iterations):
        vkey, ckey = jax.random.split(jax.random.fold_in(key, it))
        data, configs = vmc(
            wf, params, configs, nblocks=vmc_blocks,
            nsteps_per_block=vmc_steps_per_block, tstep=vmc_tstep,
            accumulators={"pgrad": sr}, key=vkey, mesh=mesh, block_fn=block_fn,
        )
        avg_keys = ("total", "dp", "dpH", "dpidpj")
        if "pgraddpI" in data[0]:  # complex-parameter channel present
            avg_keys += ("total_im", "dpI", "dpHI", "dpidpjI")
        block_avg = {
            k: np.stack([d[f"pgrad{k}"] for d in data]) for k in avg_keys
        }
        if not np.all(np.isfinite(block_avg["total"])):
            raise ValueError(
                "NaN/inf energy during optimization; the wavefunction may "
                "have collapsed (cf. linemin.py:240-242)"
            )
        steps, gnorm = sr.delta_p(taus, block_avg)
        p0 = transform.serialize(params)
        candidates = [transform.deserialize(params, p0 + jnp.asarray(s)) for s in steps]
        pos = configs.positions
        if correlated_nconf is not None:
            pos = pos[:correlated_nconf]
        energies, ess = correlated_energies(sampler, params, candidates, pos, ckey)
        # discard candidates whose correlated estimate is untrustworthy
        masked = np.where(ess > 0.3, energies, np.inf)
        best = int(np.argmin(masked)) if np.any(np.isfinite(masked)) else 0
        params = candidates[best]
        rec = {
            "iteration": it,
            "energy": float(np.mean(block_avg["total"])),
            "energy_err": float(
                np.std(block_avg["total"], ddof=1) / np.sqrt(len(data))
            ),
            "gnorm": gnorm,
            "tau": taus[best],
            "line_energies": energies,
        }
        records.append(rec)
        if verbose:
            print(
                f"linemin iter {it}: E={rec['energy']:.6f}({rec['energy_err']:.6f}) "
                f"|g|={gnorm:.4f} tau={taus[best]}", flush=True,
            )
        if hdf_file is not None:
            import h5py
            from .hdftools import append_hdf

            with h5py.File(hdf_file, "a") as f:
                append_hdf(
                    f,
                    {
                        "energy": rec["energy"],
                        "energy_err": rec["energy_err"],
                        "gnorm": gnorm,
                        "tau": taus[best],
                        "x": np.asarray(transform.serialize(params)),
                    },
                )
                # checkpoint walkers for restart (overwritten each iteration)
                configs.to_hdf(f.require_group("configs"))
    return params, configs, records
