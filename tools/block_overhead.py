"""Fixed-vs-per-step cost decomposition of the VMC block kernel.

Times the ccECP H2O block (bench.py config) at several block lengths with
pipelined dispatch and fits time_per_block = fixed + nsteps * per_step.
The fixed component is block-start work (wf.recompute, the batched RNG
draw, dispatch/sync) that longer production blocks amortize; the per-step
component is the Metropolis sweep + accumulators.

Run on the real TPU (default env):  python tools/block_overhead.py
"""

import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")


def time_block(block, params, pos, wrap, key, nsteps, reps, warmup=4):
    for _ in range(warmup):
        key, wk = jax.random.split(key)
        pos, wrap, avg = block(params, pos, wrap, wk)
        _ = float(jax.tree.leaves(avg)[0])
    trials = []
    for _ in range(3):  # interleaved trials; keep the min mean (noise ~25%)
        avgs = []
        t0 = time.perf_counter()
        for _ in range(reps):
            key, bk = jax.random.split(key)
            pos, wrap, avg = block(params, pos, wrap, bk)
            avgs.append(avg)
        for a in avgs:
            _ = float(jax.tree.leaves(a)[0])
        trials.append((time.perf_counter() - t0) / reps)
    return min(trials), pos, wrap


def main():
    import __graft_entry__ as ge
    from pyqmc_tpu.method.vmc import make_vmc_block

    nconf = 2048
    mol, wf, params, configs, acc = ge._h2o_setup(nconf=nconf)
    key = jax.random.PRNGKey(11)
    pos, wrap = configs.positions, configs.wrap
    dtype = jax.numpy.float32 if jax.default_backend() != "cpu" else pos.dtype
    pos = pos.astype(dtype)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "astype") else x, params
    )

    lengths = [25, 50, 100, 200, 400]
    for label, accs in (("move-only", {}), ("full", acc)):
        rows = []
        for nsteps in lengths:
            block = make_vmc_block(
                wf, accs, configs.geometry, tstep=0.5, nsteps=nsteps
            )
            reps = max(2, int(round(800 / nsteps)))
            dt, pos, wrap = time_block(
                block, params, pos, wrap, key, nsteps, reps
            )
            rows.append((nsteps, dt))
            print(
                f"{label:10s} nsteps={nsteps:4d}  {dt*1e3:8.1f} ms/block  "
                f"{dt/nsteps*1e3:6.3f} ms/step  "
                f"{nconf*nsteps/dt/1e6:6.2f} M w-s/s",
                flush=True,
            )
        ns = np.array([r[0] for r in rows], float)
        ts = np.array([r[1] for r in rows], float)
        per_step, fixed = np.polyfit(ns, ts, 1)
        print(
            f"{label}: fixed = {fixed*1e3:.1f} ms/block, "
            f"per-step = {per_step*1e3:.3f} ms  "
            f"(asymptotic {nconf/per_step/1e6:.2f} M w-s/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
