"""Walker-batch scaling sweep for the headline ccECP H2O VMC block.

Measured conclusion (this tool + README "utilization evidence"): block
time scales ~linearly with nconf and walker-steps/s is essentially flat
(~2.0-2.4 M/s from 512 to 8192 walkers), i.e. the sequential Metropolis
chain is per-op memory-bound on its (nconf,.)-shaped operands, not
dispatch/latency-bound — there is no throughput "knee" to exploit by
raising the batch. bench.py therefore keeps the production-like 2048
walkers (reference uses 500 walkers on CPU,
/root/reference/benchmarks/h2o_benchmark.py:13).

Usage: python tools/nconf_sweep.py [nconf ...]   (default sweep below)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def measure(nconf, nsteps=50, reps=5, warmup=5):
    import __graft_entry__ as ge
    from pyqmc_tpu.method.vmc import make_vmc_block

    mol, wf, params, configs, acc = ge._h2o_setup(nconf=nconf)
    block = make_vmc_block(wf, acc, configs.geometry, tstep=0.5, nsteps=nsteps)
    key = jax.random.PRNGKey(7)
    pos, wrap = configs.positions, configs.wrap
    dtype = jax.numpy.float32 if jax.default_backend() != "cpu" else pos.dtype
    pos = pos.astype(dtype)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "astype") else x, params
    )
    for _ in range(warmup):
        key, wk = jax.random.split(key)
        pos, wrap, avg = block(params, pos, wrap, wk)
        _ = float(jax.tree.leaves(avg)[0])
    avgs = []
    t0 = time.perf_counter()
    for _ in range(reps):
        key, bk = jax.random.split(key)
        pos, wrap, avg = block(params, pos, wrap, bk)
        avgs.append(avg)
    for a in avgs:
        _ = float(jax.tree.leaves(a)[0])
    dt = (time.perf_counter() - t0) / reps
    return dt, nconf * nsteps / dt, float(avg["energytotal"]), float(avg["acceptance"])


def main():
    sweep = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192, 16384, 32768]
    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    for nconf in sweep:
        dt, rate, e, acc = measure(nconf)
        print(
            f"nconf={nconf:6d}  block={dt * 1e3:8.1f} ms  "
            f"rate={rate / 1e6:7.3f} M walker-steps/s  E={e:.4f}  acc={acc:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
