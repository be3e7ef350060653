"""Recompute the ccECP H2O correctness anchor (README "Correctness anchors").

Pipeline: RHF -> SJ optimization (SR line minimization) -> VMC -> T-move DMC
at tstep 0.02 and 0.01 -> linear tau->0 extrapolation. Run on the TPU
(default backend); writes tools/h2o_anchor.json and prints a summary.

Published comparisons: ccECP-quality SJ-DMC for H2O is ~ -17.25 Ha
(8 valence electrons; exact NR valence energy -17.264).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu import recipes
from pyqmc_tpu.reblock import reblock_summary


def main(nconfig=2048):
    t0 = time.time()
    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
        basis="ccecp-ccpvdz", ecp="ccecp",
    )
    wf, params, records = recipes.OPTIMIZE(
        mol, nconfig=nconfig, max_iterations=20, verbose=True,
    )
    evmc = [float(r["energy"]) for r in records]
    print("opt trace:", [round(e, 4) for e in evmc], flush=True)

    data, _ = recipes.VMC(
        mol, params=params, nconfig=nconfig, nblocks=40, nsteps_per_block=20,
    )
    e = np.array([float(d["energytotal"]) for d in data])[10:]
    rb = reblock_summary(e); vmc_mean, vmc_sem = float(rb['mean']), float(rb['standard error'])
    print(f"VMC(opt SJ): {vmc_mean:.4f} +- {vmc_sem:.4f}", flush=True)

    dmc = {}
    for tstep, nblocks in [(0.02, 300), (0.01, 500)]:
        data, _, _ = recipes.DMC(
            mol, params=params, nconfig=nconfig, nblocks=nblocks,
            nsteps_per_block=10, tstep=tstep,
        )
        warm = nblocks // 4
        en = np.array([float(d["energytotal"]) for d in data])[warm:]
        rb = reblock_summary(en); m, s = float(rb['mean']), float(rb['standard error'])
        dmc[tstep] = (float(m), float(s))
        print(f"DMC tau={tstep}: {m:.4f} +- {s:.4f}", flush=True)

    (m2, s2), (m1, s1) = dmc[0.02], dmc[0.01]
    # linear extrapolation in tau: E(0) = 2*E(0.01) - E(0.02)
    e0 = 2 * m1 - m2
    s0 = np.sqrt(4 * s1**2 + s2**2)
    out = {
        "vmc_opt": [float(vmc_mean), float(vmc_sem)],
        "dmc": {str(k): v for k, v in dmc.items()},
        "dmc_tau0": [float(e0), float(s0)],
        "nconfig": nconfig,
        "backend": jax.default_backend(),
        "wall_minutes": (time.time() - t0) / 60.0,
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "h2o_anchor.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
