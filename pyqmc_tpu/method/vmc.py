"""Variational Monte Carlo driver.

TPU-first redesign of pyqmc/method/mc.py:76-274:

  * the whole block — electron sweeps (lax.fori_loop), Metropolis-Hastings
    with drift, Sherman-Morrison updates, accumulator sweeps (lax.scan over
    steps) — is ONE jit-compiled function; the Python level only loops over
    blocks and appends checkpoints (design delta #2 in SURVEY.md section 7.1);
  * walker parallelism is jax.sharding over a device mesh: walker arrays are
    sharded on the 'walkers' axis, and the per-block means become XLA
    collectives over ICI — replacing the reference's futures scatter/gather
    (mc.py:156-173);
  * randomness is counter-based jax.random, folded per (block, step,
    electron) — no global RNG state.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import Configs


def limdrift(g, cutoff=1.0):
    """Cap the drift vector norm (mc.py:76-89)."""
    g = jnp.real(g)
    tot = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
    return jnp.where(tot > cutoff, g * (cutoff / tot), g)


def make_vmc_block(wf, accumulators, geometry, tstep=0.5, nsteps=10,
                   drift_cutoff=1.0, mesh=None, accumulate_every=1,
                   unroll=False, fused="auto"):
    """Build the jitted per-block VMC kernel.

    Returns block(params, positions, wrap, key) ->
      (positions, wrap, averages dict, acceptance).

    With `mesh`, the kernel is wrapped in shard_map over the mesh's first
    axis: walker arrays are sharded, per-block averages are psum-reduced over
    ICI, and the RNG key is folded with the shard index so each shard draws
    independent streams. This replaces the reference's futures scatter/gather
    (mc.py:156-173) with single-controller SPMD.

    unroll=True unrolls the electron sweep and the step scan into
    straight-line HLO. Only useful for FLOP accounting (XLA's cost analysis
    counts loop bodies once, so rolled loops undercount by the trip count) —
    keep it False for production kernels (compile time scales with
    nelec*nsteps).

    fused: "auto" (default) uses the fused Pallas sweep kernel
    (ops/move_pallas.py) on TPU backends when the wavefunction pattern
    supports it — the whole electron sweep runs in one kernel with the
    walker state resident in VMEM, instead of ~30 HBM-round-tripping ops
    per move. False disables; "interpret" forces the kernel in Pallas
    interpreter mode (CPU testing).
    """
    nelec = wf.nelec
    accumulators = accumulators or {}
    axis = mesh.axis_names[0] if mesh is not None else None
    fused_sweep = None
    if fused and not unroll:
        on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
        if fused != "auto" or on_tpu:
            from ..ops.move_pallas import build_fused_sweep

            fused_sweep = build_fused_sweep(
                wf, geometry, tstep=tstep, drift_cutoff=drift_cutoff,
                interpret=(fused == "interpret"),
            )
    # two-half move protocol: begin(old) -> (grad_old, aux),
    # finish(new, aux) -> (grad_new, ratio, saved). Slater reads its orbital
    # cache in begin (no AO eval); Jastrows reuse begin's u_old in finish so
    # the old-position terms are evaluated once per move, not three times.
    from ..models.multiply import default_move_begin, default_move_finish

    def move_begin(params, state, e, epos):
        return default_move_begin(wf, params, state, e, epos)

    def move_finish(params, state, e, epos, aux):
        return default_move_finish(wf, params, state, e, epos, aux)

    def sweep(params, positions, wrap, state, gauss_step, unif_step):
        # gauss_step (nelec, nconf, 3) pre-scaled by sqrt(tstep);
        # unif_step (nelec, nconf). All randomness is generated OUTSIDE the
        # electron loop in one batched draw per block: per-move
        # jax.random.fold_in/normal/uniform compile to ~245 unfused scalar
        # threefry HLO ops per move — measured as ~2/3 of all device ops in
        # the block (the dispatch-bound ceiling BENCH_r02 profiled).
        dtype = positions.dtype

        def ebody(e, carry):
            positions, wrap, state, acc = carry
            epos = positions[:, e, :]
            grad_old, aux = move_begin(params, state, e, epos)
            drift_old = limdrift(grad_old, drift_cutoff)
            gauss = gauss_step[e]
            prop = epos + gauss + tstep * drift_old
            newpos, wrapdelta = geometry.enforce(prop)
            grad_new, ratio, saved = move_finish(params, state, e, newpos, aux)
            drift_new = limdrift(grad_new, drift_cutoff)
            forward = jnp.sum(gauss * gauss, axis=-1)
            backward = jnp.sum(
                (gauss + tstep * (drift_old + drift_new)) ** 2, axis=-1
            )
            t_prob = jnp.exp((forward - backward) / (2.0 * tstep))
            accept_prob = jnp.abs(ratio) ** 2 * t_prob
            accept = accept_prob > unif_step[e]
            state = wf.updateinternals(params, state, e, newpos, accept, saved)
            positions = positions.at[:, e, :].set(
                jnp.where(accept[:, None], newpos, epos)
            )
            wrap = wrap.at[:, e, :].set(
                jnp.where(accept[:, None], wrap[:, e, :] + wrapdelta, wrap[:, e, :])
            )
            acc = acc + jnp.mean(accept.astype(dtype))
            return positions, wrap, state, acc

        return jax.lax.fori_loop(
            0, nelec, ebody, (positions, wrap, state, jnp.zeros((), dtype)),
            unroll=nelec if unroll else None,
        )

    def block(params, positions, wrap, key):
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        state = wf.recompute(params, positions)
        nconf = positions.shape[0]
        dtype = positions.dtype
        # one batched draw per block for the whole Metropolis chain
        kg, ku, ka = jax.random.split(key, 3)
        gauss_all = jax.random.normal(
            kg, (nsteps, nelec, nconf, 3), dtype
        ) * jnp.sqrt(tstep).astype(dtype)
        unif_all = jax.random.uniform(ku, (nsteps, nelec, nconf), dtype)
        # accumulator keys (ECP rotations etc.): one split outside the scan
        nacc = max(len(accumulators), 1)
        akeys_all = jax.random.split(ka, nsteps * nacc).reshape(
            (nsteps, nacc) + ka.shape  # works for raw (2,)-uint32 and typed keys
        )

        def step_fn(carry, scanned):
            gauss_step, unif_step, akeys, do_acc = scanned
            positions, wrap, state = carry
            if fused_sweep is not None:
                positions, wrap, state, acc = fused_sweep(
                    params, positions, wrap, state, gauss_step, unif_step
                )
            else:
                positions, wrap, state, acc = sweep(
                    params, positions, wrap, state, gauss_step, unif_step
                )
            out = {"acceptance": acc / nelec, "_accw": do_acc}
            for i, (name, a) in enumerate(accumulators.items()):
                for k, v in a.avg(
                    wf, params, state, positions, key=akeys[i]
                ).items():
                    # zero out skipped steps; weighted mean taken below
                    out[f"{name}{k}"] = v * do_acc
            return (positions, wrap, state), out

        # accumulate observables every `accumulate_every`-th step (standard
        # practice: local energies decorrelate slower than one sweep)
        do_acc = (jnp.arange(nsteps) % accumulate_every == 0).astype(
            positions.dtype
        )
        (positions, wrap, state), outs = jax.lax.scan(
            step_fn, (positions, wrap, state),
            (gauss_all, unif_all, akeys_all, do_acc),
            unroll=nsteps if unroll else 1,
        )
        accw = outs.pop("_accw")
        nacc = jnp.sum(accw)
        avg = {
            k: (jnp.mean(v, axis=0) if k == "acceptance"
                else jnp.sum(v, axis=0) / nacc)
            for k, v in outs.items()
        }
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


def vmc(
    wf,
    params,
    configs: Configs,
    nblocks: int = 10,
    nsteps_per_block: int = 10,
    tstep: float = 0.5,
    accumulators: Optional[dict] = None,
    accumulate_every: int = 1,
    key=None,
    hdf_file: Optional[str] = None,
    verbose: bool = False,
    mesh: Optional[jax.sharding.Mesh] = None,
    continue_from_block: int = 0,
    continue_from: Optional[str] = None,
    block_fn=None,
    profile_dir: Optional[str] = None,
    profile_phases: bool = False,
):
    """Run VMC; returns (list of block dicts, final Configs).

    With `mesh`, walker arrays are sharded over the mesh's first axis and all
    block averages are computed as XLA collectives (single controller).

    continue_from: fork a run from a DIFFERENT checkpoint file — walker
    configs are loaded from it, blocks restart at 0, and output goes to
    `hdf_file` (which must not already exist: overwrite guard, reference
    mc.py:224-243 `continue_from` semantics).

    profile_dir: write a jax.profiler (XProf/TensorBoard) trace of the first
    block to this directory — the on-device per-op timeline.
    profile_phases: one-time move/accumulate wall-time split (the reference's
    per-block breakdown, mc.py:150-152): a move-only block kernel is compiled
    and timed against the full one; every block record then carries
    "move time" / "accumulate time" estimates.
    """
    if key is None:
        key = jax.random.PRNGKey(int(time.time() * 1e6) % (2**31))

    def _load_checkpoint_configs(f, fname):
        saved = Configs.from_hdf(f["configs"])
        if saved.positions.shape != configs.positions.shape:
            raise ValueError(
                f"VMC checkpoint {fname}: walker shape "
                f"{saved.positions.shape} does not match requested "
                f"{configs.positions.shape}; rerun with matching nconfig "
                "or delete the file"
            )
        if saved.geometry != configs.geometry:
            raise ValueError(
                f"VMC checkpoint {fname}: lattice does not match the "
                "requested geometry"
            )
        return saved

    if continue_from is not None:
        # fork: configs from another run's checkpoint, fresh block counter
        import os, h5py

        if hdf_file is not None and os.path.exists(hdf_file):
            raise ValueError(
                f"continue_from: output file {hdf_file} already exists — "
                "refusing to overwrite (pick a new hdf_file)"
            )
        with h5py.File(continue_from, "r") as f:
            if "configs" not in f:
                raise ValueError(
                    f"continue_from file {continue_from} holds no walker "
                    "configs"
                )
            configs = _load_checkpoint_configs(f, continue_from)
    # auto-continue from an existing checkpoint (mc.py:224-243 semantics)
    elif hdf_file is not None and continue_from_block == 0:
        import os, h5py

        if os.path.exists(hdf_file):
            with h5py.File(hdf_file, "r") as f:
                if "configs" in f and "block" in f:
                    configs = _load_checkpoint_configs(f, hdf_file)
                    continue_from_block = int(np.asarray(f["block"])[-1]) + 1
                    key = jax.random.fold_in(key, continue_from_block)
    if block_fn is None:
        block_fn = make_vmc_block(
            wf, accumulators, configs.geometry, tstep=tstep,
            nsteps=nsteps_per_block, mesh=mesh, accumulate_every=accumulate_every,
        )
    # defensive copy: the block kernels donate their walker buffers, and the
    # caller's Configs must survive (calling vmc twice with the same configs
    # is legitimate — e.g. comparing wavefunctions on common walkers)
    positions = jnp.array(configs.positions, copy=True)
    wrap = jnp.array(configs.wrap, copy=True)
    if mesh is not None:
        axis = mesh.axis_names[0]
        if positions.shape[0] % mesh.devices.size != 0:
            raise ValueError(
                f"nconf {positions.shape[0]} must divide evenly over "
                f"{mesh.devices.size} devices"
            )
        sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(axis))
        positions = jax.device_put(positions, sh)
        wrap = jax.device_put(wrap, sh)

    if hdf_file is not None:
        import h5py

    phase_split = None
    if profile_phases and accumulators:
        from ..utils.profiling import sync

        move_fn = make_vmc_block(
            wf, {}, configs.geometry, tstep=tstep, nsteps=nsteps_per_block,
            mesh=mesh, accumulate_every=accumulate_every,
        )
        # time both kernels, threading walker state (buffers are donated);
        # the timing blocks double as extra equilibration
        times = {"full": [], "move": []}
        for i in range(4):  # first rep per kernel absorbs compilation
            for tag, fn in (("full", block_fn), ("move", move_fn)):
                key, k1 = jax.random.split(key)
                t0 = time.perf_counter()
                positions, wrap, _ = fn(params, positions, wrap, k1)
                sync(positions)
                if i > 0:
                    times[tag].append(time.perf_counter() - t0)
        t_full = float(np.median(times["full"]))
        t_move = float(np.median(times["move"]))
        phase_split = {
            "move time": min(t_move, t_full),
            "accumulate time": max(t_full - t_move, 0.0),
        }
        if verbose:
            print(
                f"phase split: move {phase_split['move time']:.4f}s, "
                f"accumulate {phase_split['accumulate time']:.4f}s per block",
                flush=True,
            )

    # Without an hdf_file there is nothing to persist per block, so blocks
    # are PIPELINED: block b+1 is dispatched before block b's averages are
    # materialized (lag-1), hiding the host-device sync round-trip behind
    # device compute (measured on the axon tunnel: ~25 ms/block, +33%
    # throughput for the H2O benchmark config). With an hdf_file the loop
    # stays synchronous so every block's walkers hit the checkpoint.
    pipeline = hdf_file is None
    block_data = []
    pending = None  # (block index, device avg dict, dispatch timestamp)

    def _flush(entry, t_end):
        b, avg_dev, t0 = entry
        # jax.device_get issues the host copies for ALL leaves before
        # blocking — one overlapped round trip instead of one ~30 ms
        # round trip per leaf on the remote tunnel (measured 273 -> 38 ms)
        avg = jax.device_get(avg_dev)
        avg["block"] = b
        avg["block time"] = t_end - t0
        if phase_split is not None:
            avg.update(phase_split)
        block_data.append(avg)
        if verbose:
            tot = avg.get("energytotal", None)
            print(
                f"block {b}: acc={float(avg['acceptance']):.3f}"
                + (f" E={float(tot):.6f}" if tot is not None else ""),
                flush=True,
            )
        return avg

    for b in range(continue_from_block, continue_from_block + nblocks):
        t0 = time.perf_counter()
        key, bkey = jax.random.split(key)
        if profile_dir is not None and b == continue_from_block:
            from ..utils.profiling import trace

            with trace(profile_dir):
                positions, wrap, avg = block_fn(params, positions, wrap, bkey)
        else:
            positions, wrap, avg = block_fn(params, positions, wrap, bkey)
        if pipeline:
            if pending is not None:
                _flush(pending, time.perf_counter())
            pending = (b, avg, t0)
            continue
        avg = _flush((b, avg, t0), time.perf_counter())
        if hdf_file is not None:
            with h5py.File(hdf_file, "a") as f:
                from .hdftools import append_hdf

                append_hdf(f, avg)
                cfg_grp = f.require_group("configs")
                final = Configs.create(
                    jax.device_get(positions), configs.geometry,
                    wrap=jax.device_get(wrap),
                )
                final.to_hdf(cfg_grp)
    if pending is not None:
        _flush(pending, time.perf_counter())

    final = Configs.create(
        jax.device_get(positions), configs.geometry, wrap=jax.device_get(wrap)
    )
    return block_data, final
