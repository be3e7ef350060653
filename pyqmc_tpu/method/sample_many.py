"""Sampling from the wavefunction mixture rho = sum_i |psi_i|^2
(port of pyqmc/method/sample_many.py:42-235).

One jitted block advances all wavefunctions' states through a shared
Metropolis chain on rho and accumulates the normalized overlap matrix
N_ij = <conj(a_i) a_j / rho> and per-state weighted energies; amplitudes are
kept max-shifted for stability (compute_weights, sample_many.py:42-55).

With a `mesh`, the block kernel is shard_map'd over the mesh's first axis —
walker arrays sharded, block averages pmean-reduced over ICI, RNG keys folded
with the shard index — replacing the reference's futures scatter/gather
(sample_overlap_client, sample_many.py:94-126) with single-controller SPMD,
exactly as method/vmc.make_vmc_block does for single-state VMC.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .vmc import limdrift
from ..models.multiply import default_move_begin, default_move_finish


def _amplitudes(wfs, params_list, states):
    """a_i = phase_i e^{la_i - m}: (nwf, nconf) complex-ish; rho = sum |a|^2."""
    las, phases = [], []
    for wf, p, s in zip(wfs, params_list, states):
        ph, la = wf.value(p, s)
        las.append(la)
        phases.append(ph)
    las = jnp.stack(las)
    phases = jnp.stack(phases)
    m = jnp.max(las, axis=0, keepdims=True)
    a = phases * jnp.exp(las - m)
    rho = jnp.sum(jnp.abs(a) ** 2, axis=0)
    return a, rho


def make_overlap_block(wfs, geometry, tstep=0.5, nsteps=10, energy_acc=None,
                       accumulators=None, mesh=None):
    """accumulators: optional {name: single-wf accumulator} evaluated for
    EVERY state under the mixed distribution rho = sum_i |psi_i|^2 with
    importance weights w_i = |psi_i|^2/rho (the reference's
    AdaptSingleAccumulator, accumulators_multiwf.py:57-92): block keys
    "{name}{i}_{key}_num" and "state{i}_den" give the per-state estimate
    <O>_i = num/den.

    Returns block(params_list, positions, wrap, key) ->
    (positions, wrap, averages dict). With `mesh`, the kernel is shard_map'd
    over the mesh's first axis (walker data parallelism; averages pmean'd)."""
    nwf = len(wfs)
    nelec = wfs[0].nelec
    axis = mesh.axis_names[0] if mesh is not None else None

    def sweep(params_list, positions, wrap, states, gauss_step, unif_step):
        # gauss_step (nelec, nconf, 3) pre-scaled by sqrt(tstep), unif_step
        # (nelec, nconf): one batched draw per block (see method/vmc.py —
        # per-move fold_in/normal/uniform compile to ~245 scalar threefry
        # HLO ops per move)
        dtype = positions.dtype

        def ebody(e, carry):
            positions, wrap, states, acc = carry
            epos = positions[:, e, :]
            a, rho = _amplitudes(wfs, params_list, states)
            wnorm = jnp.abs(a) ** 2 / rho  # (nwf, nconf)
            grads, auxs = [], []
            for wf, p, s in zip(wfs, params_list, states):
                g, aux = default_move_begin(wf, p, s, e, epos)
                grads.append(jnp.real(g))
                auxs.append(aux)
            drift = limdrift(
                sum(wnorm[i][:, None] * grads[i] for i in range(nwf))
            )
            gauss = gauss_step[e]
            prop = epos + gauss + tstep * drift
            newpos, wrapdelta = geometry.enforce(prop)
            ratios, saveds, gnews = [], [], []
            for wf, p, s, aux in zip(wfs, params_list, states, auxs):
                g, r, sv = default_move_finish(wf, p, s, e, newpos, aux)
                ratios.append(r)
                saveds.append(sv)
                gnews.append(jnp.real(g))
            rho_ratio = sum(
                wnorm[i] * jnp.abs(ratios[i]) ** 2 for i in range(nwf)
            )
            drift_new = limdrift(
                sum(
                    (wnorm[i] * jnp.abs(ratios[i]) ** 2 / rho_ratio)[:, None]
                    * gnews[i]
                    for i in range(nwf)
                )
            )
            forward = jnp.sum(gauss * gauss, axis=-1)
            backward = jnp.sum(
                (gauss + tstep * (drift + drift_new)) ** 2, axis=-1
            )
            t_prob = jnp.exp((forward - backward) / (2.0 * tstep))
            accept = rho_ratio * t_prob > unif_step[e]
            states = tuple(
                wf.updateinternals(p, s, e, newpos, accept, sv)
                for wf, p, s, sv in zip(wfs, params_list, states, saveds)
            )
            positions = positions.at[:, e, :].set(
                jnp.where(accept[:, None], newpos, epos)
            )
            wrap = wrap.at[:, e, :].set(
                jnp.where(accept[:, None], wrap[:, e, :] + wrapdelta,
                          wrap[:, e, :])
            )
            return positions, wrap, states, acc + jnp.mean(accept.astype(dtype))

        return jax.lax.fori_loop(
            0, nelec, ebody, (positions, wrap, states, jnp.zeros((), dtype))
        )

    def block(params_list, positions, wrap, key):
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        states = tuple(
            wf.recompute(p, positions) for wf, p in zip(wfs, params_list)
        )

        nconf = positions.shape[0]
        dtype = positions.dtype
        kg, ku, ks = jax.random.split(key, 3)
        gauss_all = jax.random.normal(
            kg, (nsteps, nelec, nconf, 3), dtype
        ) * jnp.sqrt(tstep).astype(dtype)
        unif_all = jax.random.uniform(ku, (nsteps, nelec, nconf), dtype)
        stepkeys = jax.random.split(ks, nsteps)

        def step_fn(carry, scanned):
            gauss_step, unif_step, stepkey = scanned
            positions, wrap, states = carry
            positions, wrap, states, acc = sweep(
                params_list, positions, wrap, states, gauss_step, unif_step
            )
            a, rho = _amplitudes(wfs, params_list, states)
            nij = jnp.einsum("ic,jc->ijc", jnp.conj(a), a) / rho[None, None, :]
            out = {"acceptance": acc / nelec, "overlap": jnp.mean(nij, axis=-1)}
            if energy_acc is not None:
                for i, (wf, p, s) in enumerate(zip(wfs, params_list, states)):
                    el = energy_acc(wf, p, s, positions,
                                    key=jax.random.fold_in(stepkey, 9000 + i))["total"]
                    w = jnp.abs(a[i]) ** 2 / rho
                    out[f"energy{i}_num"] = jnp.mean(w * el)
                    out[f"energy{i}_den"] = jnp.mean(w)
            for name, acc_fn in (accumulators or {}).items():
                for i, (wf, p, s) in enumerate(zip(wfs, params_list, states)):
                    d = acc_fn(wf, p, s, positions,
                               key=jax.random.fold_in(stepkey, 9500 + i))
                    w = jnp.abs(a[i]) ** 2 / rho
                    for kname, v in d.items():
                        wb = w.reshape(w.shape + (1,) * (v.ndim - 1))
                        out[f"{name}{i}_{kname}_num"] = jnp.mean(wb * v, axis=0)
                    out[f"state{i}_den"] = jnp.mean(w)
            return (positions, wrap, states), out

        (positions, wrap, states), outs = jax.lax.scan(
            step_fn, (positions, wrap, states),
            (gauss_all, unif_all, stepkeys),
        )
        avg = jax.tree.map(lambda x: jnp.mean(x, axis=0), outs)
        if axis is not None:
            # equal shard sizes -> global mean = pmean of local means
            avg = jax.lax.pmean(avg, axis)
        return positions, wrap, avg

    if mesh is None:
        return jax.jit(block, donate_argnums=(1, 2))

    from jax.sharding import PartitionSpec as P

    pw = P(axis)
    return jax.jit(
        jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(P(), pw, pw, P()),
            out_specs=(pw, pw, P()),
            check_vma=False,
        ),
        donate_argnums=(1, 2),
    )


def sample_overlap(wfs, params_list, configs, key, nblocks=10, nsteps=10,
                   tstep=0.5, energy_acc=None, accumulators=None, mesh=None,
                   block_fn=None):
    """Returns (list of block dicts, final configs).

    Pass a prebuilt `block_fn` (from make_overlap_block) to reuse one compiled
    kernel across calls — optimize_ensemble does this so a 10-iteration run
    compiles the overlap block once, not ten times."""
    if block_fn is None:
        block_fn = make_overlap_block(
            wfs, configs.geometry, tstep=tstep, nsteps=nsteps,
            energy_acc=energy_acc, accumulators=accumulators, mesh=mesh,
        )
    # defensive copy: the block kernel donates its walker buffers; the
    # caller's Configs must survive (cf. method/vmc.py)
    positions = jnp.array(configs.positions, copy=True)
    wrap = jnp.array(configs.wrap, copy=True)
    if mesh is not None:
        from ..parallel.mesh import shard_walkers

        positions, wrap = shard_walkers(mesh, positions, wrap)
    data = []
    for b in range(nblocks):
        key, bkey = jax.random.split(key)
        positions, wrap, avg = block_fn(tuple(params_list), positions, wrap, bkey)
        # one overlapped host copy for all leaves (vs ~30 ms/leaf on the
        # remote tunnel if materialized one np.asarray at a time)
        data.append(jax.device_get(avg))
    import dataclasses

    return data, dataclasses.replace(
        configs,
        positions=jax.device_get(positions),
        wrap=jax.device_get(wrap),
    )
