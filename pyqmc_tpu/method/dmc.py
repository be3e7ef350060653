"""Fixed-node diffusion Monte Carlo with branching and population control.

TPU-first redesign of pyqmc/method/dmc.py:

  * the step loop (electron drift-diffusion sweeps with Umrigar-limited
    drift + fixed-node sign rejection, weight updates, weighted accumulator
    sums) compiles into one jit per block (cf. dmc.py:162-217);
  * branching is a stochastic comb (systematic resampling) implemented in
    pure XLA (sort-free cumsum + searchsorted) so it runs on-device
    (dmc.py:342-376 ran on the driver over a gathered population);
  * under a device mesh, branching is a GLOBAL comb: weights and walkers
    are all-gathered over ICI, every shard draws the identical comb, and
    each keeps its slice of the resampled population — the TPU equivalent
    of the reference's gather -> comb -> scatter (dmc.py:238-304,566),
    including cross-shard walker rebalancing when one shard's weights
    collapse.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import Configs
from .vmc import vmc as vmc_run


def limdrift_umrigar(g, tau):
    """Umrigar et al. drift limiting (dmc.py:22-35):
    v -> v * (sqrt(1 + 2 v^2 tau) - 1) / (v^2 tau)."""
    g = jnp.real(g)
    v2 = jnp.sum(g * g, axis=-1, keepdims=True)
    taueff = jnp.maximum(v2 * tau, 1e-12)
    fac = (jnp.sqrt(1.0 + 2.0 * taueff) - 1.0) / taueff
    return g * fac


def _dmc_parts(wf, energy_acc, geometry, tstep, nsteps, mesh=None,
               tdamp=None, tmoves=True, accumulators=None, fused="auto"):
    """Raw (unjitted) DMC kernels: the propagation `block` and the comb
    `branch`, wrapped by make_dmc_block.

    tdamp=None (default) uses the per-walker effective-timestep ratio
    r2_accepted / r2_proposed (dmc.py:192); pass a float to fix it.
    fused: use the fused Pallas drift-diffusion sweep (ops/move_pallas.py
    mode="dmc") on TPU when the wavefunction pattern supports it."""
    axis = mesh.axis_names[0] if mesh is not None else None
    nelec = wf.nelec
    fused_sweep = None
    fused_tmove = None
    if fused:
        on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
        if fused != "auto" or on_tpu:
            from ..ops.move_pallas import (
                build_fused_sweep, build_fused_tmove_sweep,
            )

            fused_sweep = build_fused_sweep(
                wf, geometry, tstep=tstep, mode="dmc",
                interpret=(fused == "interpret"),
            )
            _ecp = getattr(energy_acc, "ecp_acc", None)
            if tmoves and _ecp is not None and _ecp.active:
                fused_tmove = build_fused_tmove_sweep(
                    wf, geometry, _ecp, tstep,
                    interpret=(fused == "interpret"),
                )
    ecp_acc = getattr(energy_acc, "ecp_acc", None)
    do_tmoves = tmoves and ecp_acc is not None and ecp_acc.active
    # two-half move protocol (see method/vmc.py): begin(old) reads cached
    # state for the drift, finish(new, aux) reuses begin's work for the ratio
    from ..models.multiply import default_move_begin, default_move_finish

    def tmove_sweep(params, positions, wrap, state, tqkeys, u_sel, u_acc):
        """Anderson-Casula size-consistent T-moves (dmc.py:73-120,168-176):
        per electron, heat-bath selection among {stay} + quadrature points,
        followed by the reverse-amplitude Metropolis acceptance
        norm/back_norm (EQN 34) for detailed balance. Proposed positions are
        folded into the cell (geometry.enforce) with wrap updates, so
        periodic ECP DMC stays consistent.

        tqkeys (nelec, key): quadrature-rotation keys; u_sel/u_acc
        (nelec, nconf): pre-drawn uniforms (batched per block, see sweep)."""

        def ebody(e, carry):
            positions, wrap, state = carry
            aux, w, r = ecp_acc.tmove_quadrature(
                wf, params, state, positions, e, tqkeys[e], tstep
            )  # (c, nq, 3), (c, nq), (c, nq)
            nconf, nq = w.shape
            amp = jnp.maximum(0.0, w * r)  # forward amplitudes
            norm = 1.0 + jnp.sum(amp, axis=1)  # stay weight 1
            # categorical: index 0 = stay, 1..nq = move
            probs = jnp.concatenate(
                [1.0 / norm[:, None], amp / norm[:, None]], axis=1
            )
            cum = jnp.cumsum(probs, axis=1)
            u = u_sel[e][:, None]
            choice = jnp.sum((u > cum).astype(jnp.int32), axis=1)  # 0..nq
            move = choice > 0
            qidx = jnp.clip(choice - 1, 0, nq - 1)
            take = lambda a: jnp.take_along_axis(a, qidx[:, None], axis=1)[:, 0]
            r_m = take(r)
            w_m = take(w)
            # reverse amplitudes from the proposed point (same sphere, so
            # matrix elements carry over; ratios compose exactly):
            # q != m: max(0, w_q r_q / r_m); q == m (move back): w_m / r_m
            inv_r = jnp.where(move & (jnp.abs(r_m) > 1e-30), 1.0 / r_m, 0.0)
            amp_b = jnp.maximum(0.0, w * r * inv_r[:, None])
            amp_b = jnp.where(
                jnp.arange(nq)[None, :] == qidx[:, None],
                jnp.maximum(0.0, w_m * inv_r)[:, None],
                amp_b,
            )
            back_norm = 1.0 + jnp.sum(amp_b, axis=1)
            acc_prob = jnp.where(move, norm / back_norm, 0.0)
            accept = acc_prob > u_acc[e]
            newpos = jnp.take_along_axis(
                aux, qidx[:, None, None].astype(jnp.int32).repeat(3, axis=2), axis=1
            )[:, 0, :]
            newpos, wrapdelta = geometry.enforce(newpos)
            newpos = jnp.where(accept[:, None], newpos, positions[:, e, :])
            # gradient_value (not testvalue) so `saved` carries the MO
            # gradients the Slater orbital cache needs — otherwise
            # updateinternals pays a second AO evaluation
            _, _, saved = wf.gradient_value(params, state, e, newpos)
            state = wf.updateinternals(params, state, e, newpos, accept, saved)
            positions = positions.at[:, e, :].set(newpos)
            wrap = wrap.at[:, e, :].set(
                jnp.where(accept[:, None], wrap[:, e, :] + wrapdelta, wrap[:, e, :])
            )
            return positions, wrap, state

        return jax.lax.fori_loop(0, nelec, ebody, (positions, wrap, state))

    def pglobal_mean(x, w=None):
        """weighted global mean over walkers (and shards)."""
        if w is None:
            m = jnp.mean(x, axis=0)
            return jax.lax.pmean(m, axis) if axis else m
        wb = w.reshape(w.shape + (1,) * (x.ndim - 1))
        num = jnp.sum(wb * x, axis=0)
        den = jnp.sum(w, axis=0)
        if axis:
            num = jax.lax.psum(num, axis)
            den = jax.lax.psum(den, axis)
        return num / den

    def sweep(params, positions, wrap, state, gauss_step, unif_step):
        # gauss_step (nelec, nconf, 3) pre-scaled by sqrt(tstep);
        # unif_step (nelec, nconf). Randomness is drawn in one batched call
        # per block (see method/vmc.py sweep: per-move fold_in/normal/uniform
        # compile to ~245 unfused scalar threefry ops per move).
        nconf = positions.shape[0]
        dtype = positions.dtype

        def ebody(e, carry):
            positions, wrap, state, acc = carry
            epos = positions[:, e, :]
            grad_old, aux = default_move_begin(wf, params, state, e, epos)
            drift_old = limdrift_umrigar(grad_old, tstep)
            gauss = gauss_step[e]
            prop = epos + gauss + tstep * drift_old
            newpos, wrapdelta = geometry.enforce(prop)
            grad_new, ratio, saved = default_move_finish(
                wf, params, state, e, newpos, aux
            )
            drift_new = limdrift_umrigar(grad_new, tstep)
            forward = jnp.sum(gauss * gauss, axis=-1)
            backward = jnp.sum(
                (gauss + tstep * (drift_old + drift_new)) ** 2, axis=-1
            )
            t_prob = jnp.exp((forward - backward) / (2.0 * tstep))
            accept_prob = jnp.abs(ratio) ** 2 * t_prob
            # fixed-node: reject node crossings (dmc.py:65-67)
            if not jnp.iscomplexobj(ratio):
                accept_prob = jnp.where(jnp.real(ratio) <= 0, 0.0, accept_prob)
            accept = accept_prob > unif_step[e]
            state = wf.updateinternals(params, state, e, newpos, accept, saved)
            positions = positions.at[:, e, :].set(
                jnp.where(accept[:, None], newpos, epos)
            )
            wrap = wrap.at[:, e, :].set(
                jnp.where(accept[:, None], wrap[:, e, :] + wrapdelta, wrap[:, e, :])
            )
            # per-walker proposed/accepted displacement^2 for the effective
            # timestep ratio tdamp (dmc.py:163-192)
            r2 = jnp.sum((gauss + tstep * drift_old) ** 2, axis=-1)
            acc, r2p, r2a = acc
            return positions, wrap, state, (
                acc + jnp.mean(accept.astype(dtype)),
                r2p + r2,
                r2a + jnp.where(accept, r2, 0.0),
            )

        z = jnp.zeros(nconf, dtype)
        return jax.lax.fori_loop(
            0, nelec, ebody,
            (positions, wrap, state, (jnp.zeros((), dtype), z, z)),
        )

    def compute_S(e_trial, e_est, esigma, eloc, grad2):
        """Saturated + velocity-damped branching exponent
        (dmc.py:224-235): S = E_T - E_est + clip(E_est - E_L)
        / sqrt(1 + (v^2 tau / nelec)^2) — the damping suppresses the
        diverging local energy of a walker stuck near a node."""
        cutoff = esigma * jnp.sqrt(2.0 / tstep)
        eclip = jnp.clip(e_est - eloc, -cutoff, cutoff)
        denom = jnp.sqrt(1.0 + (grad2 * tstep / nelec) ** 2)
        return e_trial - e_est + eclip / denom

    def block(params, positions, wrap, weights, key, e_trial, e_est, esigma):
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        state = wf.recompute(params, positions)
        edat0 = energy_acc(wf, params, state, positions,
                   key=jax.random.fold_in(key, 999))
        S_old = compute_S(e_trial, e_est, esigma, edat0["total"], edat0["grad2"])

        nconf = positions.shape[0]
        dtype = positions.dtype
        # one batched draw per block for the whole chain (see method/vmc.py)
        kg, ku, kt, ke, ka = jax.random.split(key, 5)
        xs = {
            "gauss": jax.random.normal(
                kg, (nsteps, nelec, nconf, 3), dtype
            ) * jnp.sqrt(tstep).astype(dtype),
            "unif": jax.random.uniform(ku, (nsteps, nelec, nconf), dtype),
            "ekey": jax.random.split(ke, nsteps),
        }
        if do_tmoves:
            kt1, kt2, kt3 = jax.random.split(kt, 3)
            xs["tqkeys"] = jax.random.split(kt1, nsteps * nelec).reshape(
                (nsteps, nelec) + kt1.shape
            )
            xs["u_sel"] = jax.random.uniform(kt2, (nsteps, nelec, nconf), dtype)
            xs["u_acc"] = jax.random.uniform(kt3, (nsteps, nelec, nconf), dtype)
            if fused_tmove is not None:
                # pre-draw the quadrature rotations the fused kernel
                # consumes — same keys as the XLA path's in-sweep draws,
                # so the two paths produce identical chains
                from ..observables.ecp import random_rotations

                xs["tqrot"] = jax.vmap(jax.vmap(
                    lambda k: random_rotations(k, (nconf,)).astype(dtype)
                ))(xs["tqkeys"])
        nacc = max(len(accumulators or {}), 1)
        xs["akeys"] = jax.random.split(ka, nsteps * nacc).reshape(
            (nsteps, nacc) + ka.shape
        )

        def step_fn(carry, x):
            positions, wrap, state, weights, S_old = carry
            if do_tmoves:
                if fused_tmove is not None:
                    positions, wrap, state = fused_tmove(
                        params, positions, wrap, state,
                        x["tqrot"], x["u_sel"], x["u_acc"],
                    )
                else:
                    positions, wrap, state = tmove_sweep(
                        params, positions, wrap, state,
                        x["tqkeys"], x["u_sel"], x["u_acc"],
                    )
            if fused_sweep is not None:
                positions, wrap, state, (acc, r2p, r2a) = fused_sweep(
                    params, positions, wrap, state, x["gauss"], x["unif"]
                )
            else:
                positions, wrap, state, (acc, r2p, r2a) = sweep(
                    params, positions, wrap, state, x["gauss"], x["unif"]
                )
            edat = energy_acc(wf, params, state, positions, key=x["ekey"])
            S_new = compute_S(e_trial, e_est, esigma, edat["total"], edat["grad2"])
            # effective-timestep damping: the accepted fraction of the
            # proposed squared displacement (dmc.py:192)
            step_tdamp = (
                r2a / jnp.maximum(r2p, 1e-30) if tdamp is None else tdamp
            )
            weights = weights * jnp.exp(tstep * step_tdamp * 0.5 * (S_new + S_old))
            out = {"acceptance": acc / nelec}
            for k, v in edat.items():
                out[f"energy{k}"] = pglobal_mean(v, weights)
            for i, (name, a) in enumerate((accumulators or {}).items()):
                dat = a(wf, params, state, positions, key=x["akeys"][i])
                for k, v in dat.items():
                    # weight-averaged mixed estimator (dmc.py:201-217)
                    out[f"{name}{k}"] = pglobal_mean(v, weights)
            out["weight"] = (
                jax.lax.pmean(jnp.mean(weights), axis) if axis else jnp.mean(weights)
            )
            return (positions, wrap, state, weights, S_new), out

        (positions, wrap, state, weights, _), outs = jax.lax.scan(
            step_fn, (positions, wrap, state, weights, S_old), xs
        )
        avg = jax.tree.map(lambda x: jnp.mean(x, axis=0), outs)
        if axis is not None:
            avg = jax.tree.map(lambda x: jax.lax.pmean(x, axis), avg)
        return positions, wrap, weights, avg

    def branch(positions, wrap, weights, key):
        """Stochastic comb resampling (dmc.py:342-376), on-device.

        Under a mesh this is a GLOBAL comb over the whole population: every
        shard all-gathers the weights+walkers over ICI, draws the identical
        comb (same key on every shard), and keeps its slice of the resampled
        population — the TPU equivalent of the reference's gather -> comb ->
        scatter, so a shard whose walkers collapse is replenished from the
        rest of the population (cross-shard rebalancing, SURVEY §2.8)."""
        nconf = weights.shape[0]
        if axis is not None:
            wall = jax.lax.all_gather(weights, axis, tiled=True)  # (ntotal,)
            pall = jax.lax.all_gather(positions, axis, tiled=True)
            rall = jax.lax.all_gather(wrap, axis, tiled=True)
            ntot = wall.shape[0]
            cum = jnp.cumsum(wall)
            wtot = cum[-1]
            base = jax.random.uniform(key, ()) * (wtot / ntot)
            pts = base + jnp.arange(ntot) * (wtot / ntot)
            idx = jnp.clip(jnp.searchsorted(cum, pts), 0, ntot - 1)
            shard = jax.lax.axis_index(axis)
            sel = jax.lax.dynamic_slice_in_dim(idx, shard * nconf, nconf)
            return pall[sel], rall[sel], jnp.full_like(weights, jnp.mean(wall))
        cum = jnp.cumsum(weights)
        wtot = cum[-1]
        base = jax.random.uniform(key, ()) * (wtot / nconf)
        pts = base + jnp.arange(nconf) * (wtot / nconf)
        idx = jnp.clip(jnp.searchsorted(cum, pts), 0, nconf - 1)
        return positions[idx], wrap[idx], jnp.full_like(weights, jnp.mean(weights))

    return block, branch, axis


def make_dmc_block(wf, energy_acc, geometry, tstep, nsteps, mesh=None,
                   tdamp=None, tmoves=True, accumulators=None, fused="auto"):
    """Jitted (block, branch) pair; see _dmc_parts for kernel semantics."""
    block, branch, axis = _dmc_parts(
        wf, energy_acc, geometry, tstep, nsteps, mesh=mesh, tdamp=tdamp,
        tmoves=tmoves, accumulators=accumulators, fused=fused,
    )
    if mesh is None:
        return jax.jit(block), jax.jit(branch)

    from jax.sharding import PartitionSpec as P

    pw = P(axis)
    block_s = jax.jit(
        jax.shard_map(
            block, mesh=mesh,
            in_specs=(P(), pw, pw, pw, P(), P(), P(), P()),
            out_specs=(pw, pw, pw, P()),
            check_vma=False,
        )
    )
    branch_s = jax.jit(
        jax.shard_map(
            branch, mesh=mesh,
            in_specs=(pw, pw, pw, P()),
            out_specs=(pw, pw, pw),
            check_vma=False,
        )
    )
    return block_s, branch_s


def make_popctrl_update(feedback, ewin):
    """Jitted on-device population-control update.

    The reference updates e_trial on the driver between blocks
    (dmc.py:571-572), forcing a host sync every block. Here the windowed
    energy history (`ring`, `nhist`), e_est, and the feedback
    e_trial = e_est - feedback*log(<w>) are device scalars updated by this
    tiny kernel between block dispatches, so consecutive blocks chain on
    device and the host reads averages lag-1 (the same pipelining that
    hides the ~25 ms host round-trip in method/vmc.py). Kept SEPARATE from
    the propagation kernel: fusing it into the block made the axon backend
    compile a ~6x slower executable (measured r3), while three small
    dispatches are free — dispatch is async, only sync round-trips cost.
    """

    @jax.jit
    def update(ring, nhist, eb, wavg):
        dtype = ring.dtype
        ring = ring.at[nhist % ewin].set(eb.astype(dtype))
        nhist = nhist + 1
        e_est = jnp.sum(ring) / jnp.minimum(nhist, ewin).astype(dtype)
        e_trial = e_est - feedback * jnp.log(
            jnp.maximum(wavg.astype(dtype), 1e-12)
        )
        return ring, nhist, e_trial, e_est

    return update


def rundmc(
    wf,
    params,
    configs: Configs,
    nblocks: int = 100,
    nsteps_per_block: int = 10,
    tstep: float = 0.02,
    accumulators: Optional[dict] = None,
    energy_acc=None,
    key=None,
    hdf_file: Optional[str] = None,
    verbose: bool = False,
    mesh: Optional[jax.sharding.Mesh] = None,
    feedback: float = 1.0,
    warmup_vmc_blocks: int = 5,
    branchtime: int = 1,
    ewin: int = 25,
    profile_dir: Optional[str] = None,
    pipeline_depth: int = 4,
):
    """Run DMC (cf. rundmc dmc.py:413-591); returns (block dicts, configs, weights).

    profile_dir: write a jax.profiler (XProf) trace of the first block —
    the on-device timeline of the drift/diffusion sweep, ECP/T-move
    evaluation and branching collectives.

    pipeline_depth: how many blocks the host dispatches ahead of the
    device on the checkpoint-free path. The whole feedback chain
    (propagation -> popctrl -> branch) lives on device, so nothing forces
    a per-block host sync; lag-N keeps the device queue full across the
    remote-tunnel dispatch latency that capped end-to-end DMC at ~43% of
    the bare propagation kernel with lag-1 (BENCH_r04 analysis).
    """
    if key is None:
        key = jax.random.PRNGKey(int(time.time() * 1e6) % (2**31))
    if energy_acc is None:
        from ..observables.accumulators import EnergyAccumulator

        raise ValueError("energy_acc (EnergyAccumulator) is required")

    # restart from checkpoint: configs + weights + e_trial/e_est/esigma
    # (dmc.py:472-499)
    restart = None
    if hdf_file is not None:
        import os, h5py

        if os.path.exists(hdf_file):
            required = {"weights", "configs", "e_trial", "e_est", "block"}
            with h5py.File(hdf_file, "r") as f:
                keys = set(f.keys())
                if required <= keys:
                    restart = {
                        "configs": Configs.from_hdf(f["configs"]),
                        "weights": np.asarray(f["weights"]),
                        "e_trial": float(np.asarray(f["e_trial"])[-1]),
                        "e_est": float(np.asarray(f["e_est"])[-1]),
                        "esigma": float(f.attrs.get("esigma", 1.0)),
                        "block0": int(np.asarray(f["block"])[-1]) + 1,
                    }
                elif keys:
                    # a VMC output (configs, no weights), an optimization
                    # file, or a partially-written checkpoint — refuse with
                    # a named error rather than resuming from garbage
                    # (restart semantics: reference dmc.py:472-499)
                    raise ValueError(
                        f"not a DMC checkpoint: {hdf_file} has keys "
                        f"{sorted(keys)} but a DMC restart needs "
                        f"{sorted(required)}; point hdf_file at a fresh "
                        "path or a DMC-produced checkpoint"
                    )
                # else: file exists but is empty (e.g. created then killed
                # before the first block) — start fresh and overwrite
        if restart is not None:
            # a silently-mismatched checkpoint would shape-error deep inside
            # h5py or, worse, resample wrong — validate up front
            saved = restart["configs"]
            if saved.positions.shape != configs.positions.shape:
                raise ValueError(
                    f"DMC restart from {hdf_file}: checkpoint walker shape "
                    f"{saved.positions.shape} does not match requested "
                    f"{configs.positions.shape}; rerun with matching nconfig "
                    "or delete the file"
                )
            if restart["weights"].shape[0] != configs.positions.shape[0]:
                raise ValueError(
                    f"DMC restart from {hdf_file}: {restart['weights'].shape[0]} "
                    f"saved weights vs {configs.positions.shape[0]} walkers"
                )
            if saved.geometry != configs.geometry:
                raise ValueError(
                    f"DMC restart from {hdf_file}: checkpoint lattice does "
                    "not match the requested geometry"
                )
            if mesh is not None and (
                configs.positions.shape[0] % mesh.devices.size != 0
            ):
                raise ValueError(
                    f"DMC restart from {hdf_file}: walker count "
                    f"{configs.positions.shape[0]} does not divide over "
                    f"{mesh.devices.size} devices"
                )

    if restart is None:
        # VMC warmup + e_trial estimation (dmc.py:500-517)
        key, wkey = jax.random.split(key)
        wdata, configs = vmc_run(
            wf, params, configs, nblocks=warmup_vmc_blocks, nsteps_per_block=10,
            tstep=0.5, accumulators={"energy": energy_acc}, key=wkey, mesh=mesh,
        )
        state = wf.recompute(params, configs.positions)
        eloc = np.asarray(energy_acc(wf, params, state, configs.positions,
                                     key=jax.random.PRNGKey(99))["total"])
        e_est = float(np.mean(eloc))
        esigma = float(np.std(eloc))
        e_trial = e_est
        block0 = 0
        weights0 = None
    else:
        configs = restart["configs"]
        e_trial = restart["e_trial"]
        e_est = restart["e_est"]
        esigma = restart["esigma"]
        block0 = restart["block0"]
        weights0 = restart["weights"]
        key = jax.random.fold_in(key, block0)

    positions, wrap = configs.positions, configs.wrap
    dtype = positions.dtype
    weights = (
        jnp.ones(positions.shape[0], dtype=dtype)
        if weights0 is None
        else jnp.asarray(weights0, dtype)
    )
    if mesh is not None:
        axis = mesh.axis_names[0]
        sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(axis))
        positions = jax.device_put(positions, sh)
        wrap = jax.device_put(wrap, sh)
        weights = jax.device_put(weights, sh)

    block_data = []
    _last_flush = [None]

    def _finish(avg_dev, b, t0):
        # jax.device_get issues the host copies for ALL leaves before
        # blocking — one overlapped round trip instead of one ~30 ms
        # round trip per leaf on the remote tunnel (measured 273 -> 38 ms)
        avg = jax.device_get(avg_dev)
        now = time.perf_counter()
        # steady-state per-block wall time = spacing between flushes (with
        # lag-N pipelining, now - t0 would span the whole pipeline depth)
        avg["block time"] = (
            now - _last_flush[0] if _last_flush[0] is not None else now - t0
        )
        _last_flush[0] = now
        avg["block"] = b
        block_data.append(avg)
        if verbose and b % 10 == 0:
            print(
                f"dmc block {b}: E={float(avg['energytotal']):.6f} "
                f"w={float(avg['weight']):.4f} "
                f"e_trial={float(avg['e_trial']):.6f}", flush=True
            )
        return avg

    if hdf_file is None:
        # PIPELINED path: the propagation block, the tiny population-control
        # update (windowed e_est + e_trial feedback), and the comb branching
        # are all dispatched asynchronously with device-resident state, so
        # block b+1 is enqueued before block b's averages are materialized —
        # the host round-trip the reference pays every block
        # (dmc.py:571-572) is hidden behind device compute, exactly as in
        # method/vmc.py.
        block_fn, branch_fn = make_dmc_block(
            wf, energy_acc, configs.geometry, tstep, nsteps_per_block,
            mesh=mesh, accumulators=accumulators,
        )
        popctrl = make_popctrl_update(feedback, ewin)
        ring = jnp.zeros(ewin, dtype).at[0].set(jnp.asarray(e_est, dtype))
        nhist = jnp.asarray(1, jnp.int32)
        e_trial_d = jnp.asarray(e_trial, dtype)
        e_est_d = jnp.asarray(e_est, dtype)
        esigma_d = jnp.asarray(esigma, dtype)
        # pre-draw the per-block keys in ONE dispatch + ONE host pull
        # instead of a random.split dispatch per block (host numpy keys
        # then ride along with each block dispatch)
        allkeys = jax.random.split(key, 2 * nblocks)
        try:
            allkeys = jax.device_get(allkeys)
        except Exception:
            pass  # typed PRNG keys: keep on device, index per block
        import collections

        pending = collections.deque()
        for i, b in enumerate(range(block0, block0 + nblocks)):
            t0 = time.perf_counter()
            bkey, brkey = allkeys[2 * i], allkeys[2 * i + 1]
            args = (params, positions, wrap, weights, bkey,
                    e_trial_d, e_est_d, esigma_d)
            if profile_dir is not None and b == block0:
                from ..utils.profiling import trace

                with trace(profile_dir):
                    positions, wrap, weights, avg = block_fn(*args)
            else:
                positions, wrap, weights, avg = block_fn(*args)
            ring, nhist, e_trial_d, e_est_d = popctrl(
                ring, nhist, avg["energytotal"], avg["weight"]
            )
            avg = dict(avg)
            avg["e_trial"] = e_trial_d
            avg["e_est"] = e_est_d
            if (b + 1) % branchtime == 0:
                positions, wrap, weights = branch_fn(
                    positions, wrap, weights, brkey
                )
            pending.append((avg, b, t0))
            if len(pending) > max(pipeline_depth, 1):
                _finish(*pending.popleft())
        while pending:
            _finish(*pending.popleft())
    else:
        # SYNCHRONOUS path: every block's walkers/weights must reach the
        # checkpoint, so feedback stays on the host (same formulas).
        block_fn, branch_fn = make_dmc_block(
            wf, energy_acc, configs.geometry, tstep, nsteps_per_block,
            mesh=mesh, accumulators=accumulators,
        )
        # seed the window with the warmup/restart estimate — identical to the
        # pipelined path's ring initialization, so both paths apply the same
        # feedback sequence
        ehist = [e_est]
        # draw the per-block keys exactly as the pipelined path does (one
        # split of 2*nblocks, indexed per block) so checkpointed and
        # checkpoint-free runs produce identical chains
        allkeys = jax.random.split(key, 2 * nblocks)
        for i, b in enumerate(range(block0, block0 + nblocks)):
            t0 = time.perf_counter()
            bkey, brkey = allkeys[2 * i], allkeys[2 * i + 1]
            block_args = (
                params, positions, wrap, weights,
                bkey, jnp.asarray(e_trial, dtype), jnp.asarray(e_est, dtype),
                jnp.asarray(esigma, dtype),
            )
            if profile_dir is not None and b == block0:
                from ..utils.profiling import trace

                with trace(profile_dir):
                    positions, wrap, weights, avg = block_fn(*block_args)
            else:
                positions, wrap, weights, avg = block_fn(*block_args)
            wavg = float(np.asarray(avg["weight"]))
            ehist.append(float(np.asarray(avg["energytotal"])))
            e_est = float(np.mean(ehist[-ewin:]))
            e_trial = e_est - feedback * np.log(max(wavg, 1e-12))
            avg = dict(avg)
            avg["e_trial"] = e_trial
            avg["e_est"] = e_est
            avg = _finish(avg, b, t0)
            if (b + 1) % branchtime == 0:
                positions, wrap, weights = branch_fn(
                    positions, wrap, weights, brkey
                )
            import h5py
            from .hdftools import append_hdf

            with h5py.File(hdf_file, "a") as f:
                append_hdf(f, avg)
                grp = f.require_group("configs")
                Configs.create(
                    jax.device_get(positions), configs.geometry,
                    wrap=jax.device_get(wrap),
                ).to_hdf(grp)
                if "weights" in f:
                    f["weights"][...] = np.asarray(jax.device_get(weights))
                else:
                    f.create_dataset(
                        "weights", data=np.asarray(jax.device_get(weights))
                    )
                f.attrs["esigma"] = esigma

    final = Configs.create(
        jax.device_get(positions), configs.geometry, wrap=jax.device_get(wrap)
    )
    return block_data, final, np.asarray(jax.device_get(weights))
