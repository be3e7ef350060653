"""parallel.mesh helpers + sharded VMC consistency on the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from pyqmc_tpu.parallel.mesh import (
    walker_mesh, shard_walkers, replicate, pad_to_devices,
)


def test_walker_mesh_and_padding():
    mesh = walker_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("walkers",)
    assert pad_to_devices(13, mesh) % mesh.devices.size == 0
    assert pad_to_devices(16, mesh) == 16


def test_shard_and_replicate():
    mesh = walker_mesh()
    n = mesh.devices.size
    x = jnp.arange(4 * n * 3, dtype=jnp.float32).reshape(4 * n, 3)
    xs = shard_walkers(mesh, x)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))
    # sharded over the walker axis
    assert len(xs.sharding.device_set) == n
    tree = {"a": jnp.ones(5), "b": [jnp.zeros((2, 2))]}
    rep = replicate(mesh, tree)
    assert len(rep["a"].sharding.device_set) == n
    np.testing.assert_array_equal(np.asarray(rep["b"][0]), 0.0)


def test_two_arrays_shard():
    mesh = walker_mesh(2)
    a = jnp.zeros((4, 3))
    b = jnp.ones((4, 2, 3))
    sa, sb = shard_walkers(mesh, a, b)
    assert sa.shape == a.shape and sb.shape == b.shape
