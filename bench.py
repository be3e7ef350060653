"""Headline benchmark: ccECP/cc-pVDZ H2O Slater-Jastrow VMC walker-steps/s/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The config matches the reference's own headline benchmark system
(/root/reference/benchmarks/h2o_benchmark.py:10-45): ccECP pseudopotential
H2O in a cc-pVDZ-quality basis, with the semi-local ECP quadrature evaluated
inside the jitted block every step (SURVEY.md calls the ECP loop the second
hot loop). "walker-steps" counts full electron sweeps: nconf * nsteps,
matching the reference's per-step VMC semantics (pyqmc/method/mc.py:102-153).

The baseline divisor is MEASURED on this host by tools/baseline_cpu.py:
the reference's execution model (Python per-electron loop, numpy
Sherman-Morrison, jit-compiled GTO kernels standing in for numba) on the
SAME ccECP Hamiltonian including the ECP quadrature sweep — 1723.6
walker-steps/s. The baseline runs Slater-only; the TPU number includes the
Jastrow (both choices favor the baseline).
"""

import json
import time

import numpy as np
import jax


BASELINE_WALKER_STEPS_PER_SEC = 1723.6  # measured: tools/baseline_cpu.py


def main():
    import __graft_entry__ as ge
    from pyqmc_tpu.method.vmc import make_vmc_block

    nconf = 2048
    # production block length: each step still samples the energy once per
    # sweep; longer blocks amortize per-dispatch overhead (measured: 10-step
    # blocks are dominated by fixed costs on the remote-tunnel setup)
    nsteps = 50
    mol, wf, params, configs, acc = ge._h2o_setup(nconf=nconf)
    block = make_vmc_block(wf, acc, configs.geometry, tstep=0.5, nsteps=nsteps)
    key = jax.random.PRNGKey(7)
    pos, wrap = configs.positions, configs.wrap
    dtype = jax.numpy.float32 if jax.default_backend() != "cpu" else pos.dtype
    pos = pos.astype(dtype)
    params = jax.tree.map(lambda x: x.astype(dtype) if hasattr(x, "astype") else x, params)

    # warmup/compile (forcing a scalar fully materializes: on the remote
    # axon tunnel, block_until_ready alone does not guarantee sync)
    pos, wrap, avg = block(params, pos, wrap, key)
    _ = float(avg["energytotal"])

    times = []
    for i in range(7):
        key, bk = jax.random.split(key)
        t0 = time.perf_counter()
        pos, wrap, avg = block(params, pos, wrap, bk)
        _ = float(avg["energytotal"])
        times.append(time.perf_counter() - t0)

    dt = float(np.median(times))
    rate = nconf * nsteps / dt
    print(
        json.dumps(
            {
                "metric": "ccECP/cc-pVDZ H2O SJ-VMC walker-steps/sec/chip "
                          "(2048 walkers, 50-step blocks, ECP quadrature each step)",
                "value": round(rate, 1),
                "unit": "walker-steps/s",
                "vs_baseline": round(rate / BASELINE_WALKER_STEPS_PER_SEC, 3),
                "detail": {
                    "backend": jax.default_backend(),
                    "nconf": nconf,
                    "nsteps_per_block": nsteps,
                    "baseline": "measured 1723.6 walker-steps/s, reference "
                                "execution model w/ jitted kernels on this "
                                "host CPU, same ccECP Hamiltonian "
                                "(tools/baseline_cpu.py)",
                    "acceptance": float(avg["acceptance"]),
                    "energy": float(avg["energytotal"]),
                    "ecp": float(avg["energyecp"]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
