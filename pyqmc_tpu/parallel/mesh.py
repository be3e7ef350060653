"""Walker-parallel execution over device meshes.

The reference's one distributed strategy is walker-population data
parallelism over a futures executor (SURVEY 2.8; pyqmc/method/mc.py:156-173,
dmc.py:238-304). The TPU-native equivalent implemented across method/:

  * walker arrays are sharded over the mesh's first axis ('walkers');
  * per-block averages / SR reductions are jax.lax.pmean/psum over ICI;
  * DMC branching is a global stochastic comb: weights are all-gathered
    across shards, one comb resamples the full population, and each shard
    keeps its slice (method/dmc.py branch kernel; doc/parallelism.md);
  * the host only sees per-block scalars and checkpoints.

Helpers here standardize mesh construction and walker sharding.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def walker_mesh(n_devices=None, axis_name="walkers"):
    """1D mesh over the first n devices."""
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_walkers(mesh, *arrays):
    """Place arrays with the leading walker axis sharded over the mesh.

    Raises if the walker count does not divide evenly over the devices (the
    per-shard kernels assume equal shard sizes so pmean = global mean)."""
    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    ndev = mesh.devices.size
    for a in arrays:
        if a.shape[0] % ndev != 0:
            raise ValueError(
                f"walker count {a.shape[0]} must divide evenly over "
                f"{ndev} devices (see parallel.mesh.pad_to_devices)"
            )
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def pad_to_devices(nconf, mesh):
    """Smallest multiple of the device count >= nconf."""
    n = mesh.devices.size
    return ((nconf + n - 1) // n) * n
