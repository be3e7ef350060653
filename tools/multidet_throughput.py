"""Multi-determinant throughput: BASELINE config 3 walker-steps/s.

CASCI multi-Slater x three-body Jastrow with the ECP quadrature inside the
jitted block — the BASELINE.json config 3 workload whose correctness
tests/integration/test_multislater_ecp.py proves but whose throughput was
never recorded (VERDICT r4 weak #7). Multi-det expansions fall outside the
fused Pallas sweep's pattern (ops/move_pallas._match_sj requires a single
determinant), so this measures the vectorized-Sherman-Morrison XLA path
(ops/linalg.py batches the det update over the expansion; reference
semantics pyqmc/wf/slater.py:88-94).

Run (TPU): python tools/multidet_throughput.py [nconf] [nsteps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def setup(nconf):
    from pyqmc_tpu.api import (
        Molecule, run_scf, Slater, EnergyAccumulator, ECPAccumulator,
        ThreeBodyJastrow, MultiplyWF, initial_guess, run_casci,
    )

    mol = Molecule("C 0 0 0", basis="ccecpccpvdz", ecp="ccecp", spin=2)
    mf = run_scf(mol)
    energies, roots = run_casci(mf, ncas=4, nelecas=(3, 1))
    exp, coeff = roots[0]
    norb = int(max(exp.occ_up.max(), exp.occ_dn.max())) + 1
    ca = mf.mo_coeff[0][:, :norb]
    slater = Slater(mol, None, exp, (ca, ca), det_coeff=coeff)
    wf = MultiplyWF(slater, ThreeBodyJastrow(mol))
    params = wf.make_params()
    acc = {"energy": EnergyAccumulator(mol, ecp_acc=ECPAccumulator(mol, naip=6))}
    configs = initial_guess(mol, nconf, key=jax.random.PRNGKey(0))
    ndet = len(coeff)
    return mol, wf, params, configs, acc, ndet


def main(nconf=2048, nsteps=50):
    from pyqmc_tpu.method.vmc import make_vmc_block

    mol, wf, params, configs, acc, ndet = setup(nconf)
    block = make_vmc_block(wf, acc, configs.geometry, tstep=0.6, nsteps=nsteps)
    key = jax.random.PRNGKey(7)
    pos, wrap = configs.positions, configs.wrap
    dtype = jax.numpy.float32 if jax.default_backend() != "cpu" else pos.dtype
    pos = pos.astype(dtype)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "astype") else x, params
    )

    # warmup (compile + axon first-call slowness), then pipelined reps with
    # one materialization at the end — same methodology as bench.py
    for _ in range(5):
        key, wk = jax.random.split(key)
        pos, wrap, avg = block(params, pos, wrap, wk)
        _ = float(jax.tree.leaves(avg)[0])
    reps = 5
    avgs = []
    t0 = time.perf_counter()
    for _ in range(reps):
        key, bk = jax.random.split(key)
        pos, wrap, avg = block(params, pos, wrap, bk)
        avgs.append(avg)
    for a in avgs:
        _ = float(jax.tree.leaves(a)[0])
    dt = (time.perf_counter() - t0) / reps
    rate = nconf * nsteps / dt

    print(json.dumps({
        "metric": "C(CASCI-4o4e multi-Slater x J3 + ccECP) VMC "
                  "walker-steps/s/chip",
        "value": round(rate, 1),
        "unit": "walker-steps/s",
        "detail": {
            "backend": jax.default_backend(),
            "ndet": ndet,
            "nconf": nconf,
            "nsteps_per_block": nsteps,
            "ms_per_step": round(dt / nsteps * 1e3, 4),
            "energy": float(avg["energytotal"]),
            "acceptance": float(avg["acceptance"]),
            "path": "XLA sweep (multi-det is outside the fused-Pallas "
                    "pattern; vectorized Sherman-Morrison over dets)",
        },
    }))
    return rate


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2048,
        int(sys.argv[2]) if len(sys.argv) > 2 else 50,
    )
