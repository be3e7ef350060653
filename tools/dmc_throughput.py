"""T-move DMC throughput on the ccECP/cc-pVDZ H2O benchmark config.

Measures end-to-end rundmc() walker-steps/s/chip (drift-diffusion sweep +
Casula T-move sweep with ECP quadrature + energy accumulator + on-device
population control and branching). Counterpart of the VMC headline in
bench.py; run on the real TPU:

  python tools/dmc_throughput.py [nconfig] [nblocks]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


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
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
