"""enforce_pbc / minimal-image geometry unit checks.

Mirrors the reference's tests/unit/test_pbcs.py:19-75 (fold + wrap
reconstruction on a skewed lattice) and test_minimal_image.py (27-image
search agrees with brute force) against the TPU-native kernels
(pyqmc_tpu/ops/pbc.py, configs.Geometry).
"""

import numpy as np
import jax.numpy as jnp

from pyqmc_tpu.ops.pbc import enforce_pbc
from pyqmc_tpu.configs import Geometry


def _skewed_lattice():
    # non-orthogonal, non-diagonal lattice to exercise the general path
    return np.array([[3.0, 0.2, -0.1], [0.4, 2.5, 0.3], [-0.2, 0.1, 4.0]])


def test_enforce_pbc_fold_and_wrap_reconstruction():
    lattice = _skewed_lattice()
    inv = np.linalg.inv(lattice)
    rng = np.random.default_rng(3)
    epos = jnp.asarray(rng.uniform(-20, 20, size=(500, 3)))
    wrapped, wrap = enforce_pbc(jnp.asarray(lattice), jnp.asarray(inv), epos)
    # folded points lie inside the unit cell in fractional coordinates
    frac = np.asarray(wrapped) @ inv
    assert frac.min() >= -1e-6 and frac.max() <= 1 + 1e-6
    # original = folded + wrap @ lattice, exactly
    rec = np.asarray(wrapped) + np.asarray(wrap) @ lattice
    np.testing.assert_allclose(rec, np.asarray(epos), atol=1e-10)
    assert np.asarray(wrap).dtype == np.int32


def test_enforce_pbc_idempotent():
    lattice = _skewed_lattice()
    inv = np.linalg.inv(lattice)
    rng = np.random.default_rng(4)
    epos = jnp.asarray(rng.uniform(-20, 20, size=(200, 3)))
    w1, _ = enforce_pbc(jnp.asarray(lattice), jnp.asarray(inv), epos)
    w2, wrap2 = enforce_pbc(jnp.asarray(lattice), jnp.asarray(inv), w1)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1), atol=1e-10)
    assert np.abs(np.asarray(wrap2)).max() == 0


def test_minimal_image_vs_brute_force():
    """Geometry.minimal_image agrees with an explicit 125-image search on a
    skewed lattice (reference test_minimal_image.py semantics)."""
    lattice = _skewed_lattice()
    geom = Geometry(lattice=lattice)
    rng = np.random.default_rng(5)
    d = rng.uniform(-8, 8, size=(300, 3))
    got = np.asarray(geom.minimal_image(jnp.asarray(d)))
    shifts = np.array(
        [[i, j, k] for i in range(-4, 5) for j in range(-4, 5)
         for k in range(-4, 5)]
    ) @ lattice
    cand = d[:, None, :] - shifts[None, :, :]
    best = cand[np.arange(len(d)), np.argmin((cand**2).sum(-1), axis=1)]
    np.testing.assert_allclose(
        (got**2).sum(-1), (best**2).sum(-1), atol=1e-9
    )
