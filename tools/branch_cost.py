"""Measure the DMC global-branching communication cost at 8 virtual devices
(VERDICT r2 item 10).

The global comb all-gathers the full walker population (positions + wrap +
weights) over the mesh every `branchtime` blocks (method/dmc.py branch).
This script times branch_fn against the propagation block for 512 and 4096
walkers of the He/sto-3g system on an 8-device CPU mesh and prints the
ratio; doc/parallelism.md records the decision.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/branch_cost.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.method.dmc import make_dmc_block
from pyqmc_tpu.parallel.mesh import walker_mesh, shard_walkers
from pyqmc_tpu.configs import initial_guess


def timeit(fn, reps=20):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure(tag, wf, params, acc, configs, mesh, e_ref, reps=20):
    import jax.numpy as jnp

    nconf = configs.positions.shape[0]
    block_fn, branch_fn = make_dmc_block(
        wf, acc, configs.geometry, tstep=0.02, nsteps=10, mesh=mesh
    )
    positions, wrap = shard_walkers(mesh, configs.positions, configs.wrap)
    weights = shard_walkers(mesh, jnp.ones(nconf, positions.dtype))
    key = jax.random.PRNGKey(1)
    t_block = timeit(
        lambda: block_fn(params, positions, wrap, weights, key,
                         e_ref, e_ref, 0.5)[0], reps
    )
    t_branch = timeit(
        lambda: branch_fn(positions, wrap, weights, key)[0], reps
    )
    print(
        f"{tag} nconf={nconf}: block {t_block*1e3:8.2f} ms  "
        f"branch {t_branch*1e3:7.3f} ms  "
        f"ratio {100*t_branch/t_block:5.2f}% of block time"
    )


def main():
    mol = Molecule("He 0 0 0", basis="sto-3g")
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    params = wf.make_params()
    acc = EnergyAccumulator(mol)
    mesh = walker_mesh(8)

    for nconf in (512, 4096):
        configs = initial_guess(mol, nconf, key=jax.random.PRNGKey(0))
        measure("He/sto-3g   ", wf, params, acc, configs, mesh, -2.9)

    # the production-shaped config: ccECP H2O with the quadrature in-block
    import __graft_entry__ as ge

    mol, wf, params, configs, accs = ge._h2o_setup(nconf=512)
    measure("H2O/ccECP   ", wf, params, accs["energy"], configs, mesh,
            -17.2, reps=5)


if __name__ == "__main__":
    main()
