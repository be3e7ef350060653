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


def make_correlated_sampler(wf, energy_acc, geometry, mesh=None):
    """Returns jitted f(params, positions, key) -> (logabs, eloc).

    With `mesh`, the evaluation is shard_map'd over the walker axis — each
    shard recomputes its local walkers under the candidate parameters (the
    SPMD replacement for the reference's scattered correlated_compute,
    linemin.py:339-375); outputs stay sharded and the host-side weighted
    means in correlated_energies operate on the global arrays."""
    axis = mesh.axis_names[0] if mesh is not None else None

    def f(params, positions, key):
        if axis is not None:
            # deterministic per shard AND identical across candidate calls,
            # so the ECP quadrature rotations stay correlated
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        state = wf.recompute(params, positions)
        _, logabs = wf.value(params, state)
        eloc = energy_acc(wf, params, state, positions, key=key)["total"]
        return logabs, eloc

    if mesh is None:
        return jax.jit(f)

    from jax.sharding import PartitionSpec as P

    pw = P(axis)
    return jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=(P(), pw, P()), out_specs=(pw, pw),
            check_vma=False,
        )
    )


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
        out.append(jnp.mean(w * eloc) / jnp.mean(w))
        esses.append(jnp.sum(w) ** 2 / (jnp.sum(w * w) * n))
    # materialize all candidates in one overlapped host copy (per-scalar
    # float() costs a ~30 ms round trip each on the remote tunnel)
    out, esses = jax.device_get((out, esses))
    return np.asarray(out), np.asarray(esses)


def select_candidate(energies, ess, taus, ess_threshold=0.3, iteration=None):
    """Pick the lowest-energy candidate whose correlated estimate is
    trustworthy (effective sample size above `ess_threshold`).

    Returns (best_index, taus). When EVERY candidate fails the ESS guard the
    line search has stalled: the proposed steps move too far from |psi_0|^2
    to be evaluated by reweighting. Instead of silently stepping by tau=0
    (the reference would, linemin.py fallback), return best_index=None, emit
    a warning, and halve the tau grid so the next iteration proposes shorter
    steps."""
    import logging

    masked = np.where(np.asarray(ess) > ess_threshold, energies, np.inf)
    if np.any(np.isfinite(masked)):
        return int(np.argmin(masked)), taus
    halved = [t / 2.0 for t in taus]
    logging.warning(
        "linemin%s: all %d correlated-sampling candidates rejected "
        "(ESS <= %.2f, max ESS %.3f); keeping parameters and halving the "
        "tau grid to %s",
        f" iteration {iteration}" if iteration is not None else "",
        len(energies), ess_threshold, float(np.max(ess)), halved,
    )
    return None, halved


def update_tau_grid(taus, taus0, ok_streak, stalled, tau_recover=2):
    """Post-iteration tau-grid bookkeeping: after `tau_recover` consecutive
    non-stalled iterations, double a stall-halved grid back toward the
    original `taus0` (element-wise capped), so one pathological iteration
    does not permanently ratchet all future step sizes down.

    Returns (taus, ok_streak)."""
    if stalled:
        return taus, 0
    ok_streak += 1
    if ok_streak >= tau_recover and list(taus) != list(taus0):
        return [min(2.0 * t, t0) for t, t0 in zip(taus, taus0)], 0
    return taus, ok_streak


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
    tau_recover: int = 2,
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

    When an iteration stalls (all correlated-sampling candidates fail the
    ESS guard) the tau grid is halved; after `tau_recover` consecutive
    non-stalled iterations it is doubled back toward the original grid, so
    one pathological iteration does not permanently shrink all later steps.
    """
    if key is None:
        key = jax.random.PRNGKey(int(time.time() * 1e6) % (2**31))
    if correlated_nconf is not None:
        nconf = configs.positions.shape[0]
        if not (0 < correlated_nconf <= nconf):
            raise ValueError(
                f"correlated_nconf={correlated_nconf} must be in "
                f"[1, nconf={nconf}]"
            )
        if mesh is not None and correlated_nconf % mesh.devices.size != 0:
            raise ValueError(
                f"correlated_nconf={correlated_nconf} does not divide over "
                f"the {mesh.devices.size}-device mesh; pick a multiple of "
                f"{mesh.devices.size}"
            )
    sr = StochasticReconfiguration(energy_acc, transform, eps=sr_eps)
    sampler = make_correlated_sampler(wf, energy_acc, configs.geometry,
                                      mesh=mesh)
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
                    x_saved = np.asarray(f["x"])[-1]
                    nparam = int(transform.serialize(params).shape[0])
                    if x_saved.shape[0] != nparam:
                        raise ValueError(
                            f"linemin restart from {hdf_file}: checkpoint "
                            f"holds {x_saved.shape[0]} parameters but the "
                            f"wavefunction/transform expects {nparam}; the "
                            "file belongs to a different wavefunction"
                        )
                    params = transform.deserialize(params, jnp.asarray(x_saved))
                    if "configs" in f:
                        saved = Configs.from_hdf(f["configs"])
                        if saved.positions.shape != configs.positions.shape:
                            raise ValueError(
                                f"linemin restart from {hdf_file}: checkpoint "
                                f"walker shape {saved.positions.shape} does "
                                f"not match requested "
                                f"{configs.positions.shape}; rerun with "
                                "matching nconfig or delete the file"
                            )
                        configs = saved
                    if verbose:
                        print(
                            f"linemin: resuming at iteration {start_it} "
                            f"from {hdf_file}", flush=True,
                        )

    taus = list(taus)
    taus0 = list(taus)
    ok_streak = 0
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
        best, taus = select_candidate(energies, ess, taus, iteration=it)
        stalled = best is None
        if stalled:
            chosen_tau = 0.0
        else:
            params = candidates[best]
            chosen_tau = taus[best]
        taus, ok_streak = update_tau_grid(taus, taus0, ok_streak, stalled,
                                          tau_recover)
        rec = {
            "iteration": it,
            "energy": float(np.mean(block_avg["total"])),
            "energy_err": float(
                np.std(block_avg["total"], ddof=1) / np.sqrt(len(data))
            ),
            "gnorm": gnorm,
            "tau": chosen_tau,
            "stalled": stalled,
            "line_energies": energies,
        }
        records.append(rec)
        if verbose:
            print(
                f"linemin iter {it}: E={rec['energy']:.6f}({rec['energy_err']:.6f}) "
                f"|g|={gnorm:.4f} tau={chosen_tau}", flush=True,
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
                        "tau": chosen_tau,
                        "x": np.asarray(transform.serialize(params)),
                    },
                )
                # checkpoint walkers for restart (overwritten each iteration)
                configs.to_hdf(f.require_group("configs"))
    return params, configs, records
