"""T-move DMC throughput on the ccECP/cc-pVDZ H2O benchmark config.

Measures end-to-end rundmc() walker-steps/s/chip (drift-diffusion sweep +
Casula T-move sweep with ECP quadrature + energy accumulator + on-device
population control and branching), plus a differential-kernel phase split
(VERDICT r3 item 4): per-step cost of the T-move sweep, the energy
accumulator, and the drift-diffusion sweep, measured by timing block
variants with each piece removed (the same methodology as bench.py's VMC
profile), and the branch kernel timed separately.

Run on the real TPU:

  python tools/dmc_throughput.py [nconfig] [nblocks]
  python tools/dmc_throughput.py profile [nconfig] [nsteps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


class _NullEnergy:
    """Zero-cost energy accumulator stand-in: isolates the drift sweep."""

    ecp_acc = None
    active = False

    def __call__(self, wf, params, state, positions, key=None):
        z = jnp.zeros(positions.shape[0], positions.dtype)
        return {"total": z, "grad2": z}


def profile(nconf=2048, nsteps=50):
    """Differential phase split of the DMC block at production shapes."""
    import __graft_entry__ as ge
    from pyqmc_tpu.method.dmc import make_dmc_block

    mol, wf, params, configs, acc = ge._h2o_setup(nconf=nconf)
    energy_acc = acc["energy"]
    dtype = jnp.float32 if jax.default_backend() != "cpu" else \
        configs.positions.dtype
    pos0 = configs.positions.astype(dtype)
    wrap0 = configs.wrap
    params = jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "astype") and jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating) else x,
        params,
    )
    tstep = 0.01
    scal = [jnp.asarray(v, dtype) for v in (-17.2, -17.2, 1.0)]
    key = jax.random.PRNGKey(5)

    variants = {
        "full": dict(tmoves=True, acc=energy_acc),
        "no_tmove": dict(tmoves=False, acc=energy_acc),
        "drift_only": dict(tmoves=False, acc=_NullEnergy()),
    }
    times = {}
    blocks = {}
    for name, v in variants.items():
        block, branch = make_dmc_block(
            wf, v["acc"], configs.geometry, tstep, nsteps, tmoves=v["tmoves"]
        )
        blocks[name] = (block, branch)
        p, w = jnp.array(pos0), jnp.array(wrap0)
        wt = jnp.ones(nconf, dtype)
        block = blocks[name][0]
        for _ in range(5):
            key, k = jax.random.split(key)
            p, w, wt, avg = block(params, p, w, wt, k, *scal)
            _ = float(jax.tree.leaves(avg)[0])
        avgs = []
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            key, k = jax.random.split(key)
            p, w, wt, avg = block(params, p, w, wt, k, *scal)
            avgs.append(avg)
        for a in avgs:
            _ = float(jax.tree.leaves(a)[0])
        times[name] = (time.perf_counter() - t0) / reps

    # branch kernel on its own
    _, branch = blocks["full"]
    p, w = jnp.array(pos0), jnp.array(wrap0)
    wt = jnp.ones(nconf, dtype)
    for _ in range(3):
        key, k = jax.random.split(key)
        p, w, wt = branch(p, w, wt, k)
        _ = float(p.ravel()[0])
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        key, k = jax.random.split(key)
        p, w, wt = branch(p, w, wt, k)
    _ = float(p.ravel()[0])
    t_branch = (time.perf_counter() - t0) / reps

    ms = lambda t: t / nsteps * 1e3
    out = {
        "tmove_sweep_ms_per_step": round(
            ms(max(times["full"] - times["no_tmove"], 0.0)), 4),
        "energy_acc_ms_per_step": round(
            ms(max(times["no_tmove"] - times["drift_only"], 0.0)), 4),
        "drift_sweep_ms_per_step": round(ms(times["drift_only"]), 4),
        "block_full_ms_per_step": round(ms(times["full"]), 4),
        "branch_ms_per_call": round(t_branch * 1e3, 4),
        "rate_full": round(nconf * nsteps / times["full"], 1),
    }
    print(f"DMC phase split (nconf={nconf}, nsteps={nsteps}, "
          f"backend={jax.default_backend()}):")
    for k_, v_ in out.items():
        print(f"  {k_:28s} {v_}")
    return out


def main(nconf=2048, nblocks=20, nsteps=10):
    import __graft_entry__ as ge
    from pyqmc_tpu.method.dmc import rundmc

    mol, wf, params, configs, acc = ge._h2o_setup(nconf=nconf)
    t0 = time.perf_counter()
    data, final, weights = rundmc(
        wf, params, configs, nblocks=nblocks, nsteps_per_block=nsteps,
        tstep=0.01, energy_acc=acc["energy"], key=jax.random.PRNGKey(3),
        warmup_vmc_blocks=2,
    )
    total = time.perf_counter() - t0
    # steady state: skip the first half (compile + tunnel warmup)
    bt = np.array([d["block time"] for d in data])
    steady = np.median(bt[nblocks // 2:])
    rate = nconf * nsteps / steady
    e = np.mean([d["energytotal"] for d in data[nblocks // 2:]])
    print(f"nconf={nconf} nsteps/block={nsteps} blocks={nblocks} "
          f"total {total:.1f}s")
    print(f"steady block {steady*1e3:.1f} ms -> {rate:,.0f} walker-steps/s "
          f"(E={e:.5f})")
    return rate


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "profile":
        profile(*[int(a) for a in sys.argv[2:]])
    else:
        main(*[int(a) for a in sys.argv[1:]])
