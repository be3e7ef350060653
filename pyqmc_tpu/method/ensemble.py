"""Excited-state (ensemble) optimization with overlap penalties.

Compact wf-by-wf redesign of pyqmc/method/ensemble_optimization_wfbywf.py
(and the threaded variant): states are optimized against

    Cost_k = E_k + lambda * sum_{j<k} |O_kj|^2

with all expectations taken over the mixture rho = sum_i |psi_i|^2
(importance-sampled ratio estimators make the rho-dependence cancel). The
energy gradient, overlap gradient and SR metric for one state are computed
in a single jitted pass; the (nparam, nparam) solve is host-side.

Multi-chip: with a `mesh`, both the shared overlap-sampling block and the
per-state gradient estimators are shard_map'd over the walker axis with
pmean-reduced averages — the TPU equivalent of the reference's thread-pooled
futures fan-out (ensemble_optimization_threaded.py:73-234). Checkpoint/
restart mirrors the reference's per-state HDF5 groups
(ensemble_optimization_threaded.py:273-282): each iteration appends the
serialized parameter vector of every optimizable state plus walker configs,
and an interrupted run resumes at the recorded iteration.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .sample_many import sample_overlap, make_overlap_block, _amplitudes
from ..parallel.mesh import shard_walkers


def make_state_gradient_fn(wfs, k, transform, energy_acc, mesh=None):
    """Jitted estimator of the penalty-SR ingredients for state k.

    With `mesh`, walker positions are sharded over the first mesh axis and
    every output (all are walker-axis means) is pmean-reduced over ICI."""
    axis = mesh.axis_names[0] if mesh is not None else None

    def fn(params_list, positions, key):
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        states = tuple(
            wf.recompute(p, positions) for wf, p in zip(wfs, params_list)
        )
        a, rho = _amplitudes(wfs, params_list, states)
        wk = jnp.abs(a[k]) ** 2 / rho  # (nconf,)
        el = energy_acc(wfs[k], params_list[k], states[k], positions, key=key)[
            "total"
        ]
        pg = wfs[k].pgradient(params_list[k], positions)
        dp, _ = transform.serialize_gradients_pair(pg)  # real channel (nconf, np)
        nconf = dp.shape[0]
        out = {
            "den": jnp.mean(wk),
            "el_w": jnp.mean(wk * el),
            "dp_el_w": jnp.einsum("c,c,cp->p", wk, el, dp) / nconf,
            "dp_w": jnp.einsum("c,cp->p", wk, dp) / nconf,
            "dpdp_w": jnp.einsum("c,ci,cj->ij", wk, dp, dp) / nconf,
            "nkk": jnp.mean(jnp.abs(a[k]) ** 2 / rho),
        }
        for j in range(len(wfs)):
            cross = jnp.conj(a[k]) * a[j] / rho
            out[f"n_{j}"] = jnp.mean(jnp.real(cross))
            out[f"dp_n_{j}"] = jnp.einsum("c,cp->p", jnp.real(cross), dp) / nconf
        if axis is not None:
            # equal shard sizes -> global mean = pmean of local means
            out = jax.lax.pmean(out, axis)
        return out

    if mesh is None:
        return jax.jit(fn)

    from jax.sharding import PartitionSpec as P

    pw = P(axis)
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=(P(), pw, P()), out_specs=P(),
            check_vma=False,
        )
    )


def delta_p_state(k, est, taus, penalty, eps=1e-3, nlower=None):
    """Host-side penalty-SR step from averaged estimator dicts."""
    den = est["den"]
    e_k = est["el_w"] / den
    grad_e = 2.0 * (est["dp_el_w"] - e_k * est["dp_w"]) / den
    g = grad_e.copy()
    nkk = est["nkk"]
    for j in range(nlower if nlower is not None else k):
        njj = est.get(f"njj_{j}", None)
        n_kj = est[f"n_{j}"]
        o_kj = n_kj / np.sqrt(nkk * est[f"njj_{j}"]) if njj else n_kj / nkk
        d_o = (est[f"dp_n_{j}"] - n_kj * est["dp_w"] / nkk) / nkk
        g = g + 2.0 * penalty * o_kj * d_o
    dpm = est["dp_w"] / den
    S = est["dpdp_w"] / den - np.outer(dpm, dpm)
    step = np.linalg.solve(S + eps * np.eye(len(g)), g)
    return [-tau * step for tau in taus], e_k


def optimize_ensemble(
    wfs,
    params_list,
    transforms,
    configs,
    energy_acc,
    key=None,
    max_iterations=10,
    penalty=2.0,
    tau=0.1,
    nblocks=6,
    nsteps=10,
    tstep=0.5,
    mesh=None,
    hdf_file=None,
    verbose=False,
):
    """Optimize every state against all lower states.

    transforms: list of LinearTransform (None = state frozen).
    mesh: shard walkers over the mesh's first axis (overlap sampling and the
    per-state gradient estimators both run as SPMD collectives).
    hdf_file: append per-iteration state (serialized parameters of every
    optimizable state as `x{k}`, energies, the overlap matrix, walker
    configs) and resume from it if it already holds iterations.
    Returns (params_list, records).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    params_list = list(params_list)
    # compile once: the overlap block and each state's gradient estimator are
    # built outside the iteration loop (the pattern linemin.py uses for its
    # VMC block) — one compile per call, not per iteration.
    block_fn = make_overlap_block(
        wfs, configs.geometry, tstep=tstep, nsteps=nsteps,
        energy_acc=energy_acc, mesh=mesh,
    )
    grad_fns = [
        make_state_gradient_fn(wfs, k, t, energy_acc, mesh=mesh)
        if t is not None else None
        for k, t in enumerate(transforms)
    ]

    start_it = 0
    if hdf_file is not None:
        import os
        import h5py
        from ..configs import Configs

        if os.path.exists(hdf_file):
            with h5py.File(hdf_file, "r") as f:
                if "iteration" in f and len(f["iteration"]) > 0:
                    start_it = int(np.asarray(f["iteration"])[-1]) + 1
                    for k, t in enumerate(transforms):
                        if t is None:
                            continue
                        params_list[k] = t.deserialize(
                            params_list[k],
                            jnp.asarray(np.asarray(f[f"x{k}"])[-1]),
                        )
                    if "configs" in f:
                        saved = Configs.from_hdf(f["configs"])
                        if saved.positions.shape != configs.positions.shape:
                            raise ValueError(
                                f"ensemble restart from {hdf_file}: checkpoint "
                                f"walker shape {saved.positions.shape} does not "
                                f"match requested {configs.positions.shape}; "
                                "rerun with matching nconfig or delete the file"
                            )
                        configs = saved
                    if verbose:
                        print(
                            f"ensemble: resuming at iteration {start_it} "
                            f"from {hdf_file}", flush=True,
                        )

    records = []
    for it in range(start_it, max_iterations):
        # fold the iteration index so a resumed run draws the same stream it
        # would have drawn uninterrupted
        skey, gkey_base = jax.random.split(jax.random.fold_in(key, it))
        data, configs = sample_overlap(
            wfs, params_list, configs, skey, nblocks=nblocks,
            block_fn=block_fn, mesh=mesh,
        )
        overlap = np.mean([d["overlap"] for d in data], axis=0)
        rec = {"iteration": it, "overlap": overlap}
        positions = configs.positions
        if mesh is not None:
            positions = shard_walkers(mesh, positions)
        for k, (t, gfn) in enumerate(zip(transforms, grad_fns)):
            if t is None:
                continue
            gkey = jax.random.fold_in(gkey_base, k)
            est = jax.device_get(gfn(tuple(params_list), positions, gkey))
            # normalized lower-state overlaps need N_jj too
            for j in range(k):
                est[f"njj_{j}"] = float(np.real(overlap[j, j]))
            steps, e_k = delta_p_state(k, est, [tau], penalty)
            flat = t.serialize(params_list[k]) + jnp.asarray(steps[0])
            params_list[k] = t.deserialize(params_list[k], flat)
            rec[f"energy{k}"] = float(e_k)
        records.append(rec)
        if hdf_file is not None:
            import h5py
            from .hdftools import append_hdf

            with h5py.File(hdf_file, "a") as f:
                row = {"iteration": it, "overlap": overlap}
                for k, t in enumerate(transforms):
                    if t is None:
                        continue
                    row[f"x{k}"] = np.asarray(t.serialize(params_list[k]))
                    row[f"energy{k}"] = rec[f"energy{k}"]
                append_hdf(f, row)
                configs.to_hdf(f.require_group("configs"))
        if verbose:
            es = {kk: v for kk, v in rec.items() if kk.startswith("energy")}
            print(f"ensemble iter {it}: {es} |O01|="
                  f"{abs(overlap[0,1]/np.sqrt(abs(overlap[0,0]*overlap[1,1]))):.4f}"
                  if overlap.shape[0] > 1 else "", flush=True)
    return params_list, records
