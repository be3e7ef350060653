"""GTO evaluator: finite-difference derivative checks and normalization.

Mirrors the intent of the reference's tests/unit/test_gto.py:114-136 (which
compares numba vs pyscf); without pyscf we check against finite differences
and analytic normalization instead.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.ops.gto import GTOSpec, eval_gto


@pytest.fixture(scope="module")
def h2o():
    return Molecule(
        "O 0 0 0; H 0 -1.43 1.11; H 0 1.43 1.11", basis="sto-3g", unit="bohr"
    )


@pytest.fixture(scope="module")
def lih_ccecp():
    return Molecule("Li 0 0 0; H 0 0 3.015", basis={
        "Li": [[0, [1.0, 1.0]], [1, [0.8, 1.0]], [2, [0.6, 1.0]]],
        "H": [[0, [13.01, 0.019685], [1.962, 0.137977], [0.4446, 0.478148]],
              [0, [0.122, 1.0]], [1, [0.727, 1.0]]],
    })


def fd_check(spec, X, delta=1e-6):
    ao, grad, lap = eval_gto(spec, X, mode=2)
    # gradient FD
    for ax in range(3):
        shift = np.zeros(3)
        shift[ax] = delta
        ap = eval_gto(spec, X + shift, mode=0)
        am = eval_gto(spec, X - shift, mode=0)
        fd = (ap - am) / (2 * delta)
        np.testing.assert_allclose(grad[:, ax], fd, rtol=2e-5, atol=1e-7)
    # laplacian FD (larger delta: second differences amplify roundoff)
    dl = 1e-4
    acc = -6.0 * ao
    for ax in range(3):
        shift = np.zeros(3)
        shift[ax] = dl
        acc = acc + eval_gto(spec, X + shift, mode=0) + eval_gto(spec, X - shift, mode=0)
    fd_lap = acc / dl**2
    np.testing.assert_allclose(lap, fd_lap, rtol=2e-4, atol=2e-5)


def test_fd_h2o(h2o):
    spec = GTOSpec.from_molecule(h2o)
    X = jnp.asarray(np.random.default_rng(1).normal(scale=1.5, size=(40, 3)))
    fd_check(spec, X)


def test_fd_high_l(lih_ccecp):
    spec = GTOSpec.from_molecule(lih_ccecp)
    X = jnp.asarray(np.random.default_rng(2).normal(scale=2.0, size=(40, 3)))
    fd_check(spec, X)


def test_mode_consistency(h2o):
    spec = GTOSpec.from_molecule(h2o)
    X = jnp.asarray(np.random.default_rng(3).normal(size=(17, 3)))
    a0 = eval_gto(spec, X, mode=0)
    a1, g1 = eval_gto(spec, X, mode=1)
    a2, g2, l2 = eval_gto(spec, X, mode=2)
    np.testing.assert_allclose(a0, a1, rtol=1e-14)
    np.testing.assert_allclose(a0, a2, rtol=1e-14)
    np.testing.assert_allclose(g1, g2, rtol=1e-14)


def test_batch_shapes(h2o):
    spec = GTOSpec.from_molecule(h2o)
    X = jnp.asarray(np.random.default_rng(5).normal(size=(4, 5, 3)))
    ao = eval_gto(spec, X, mode=0)
    assert ao.shape == (4, 5, spec.nao)
    ao2 = eval_gto(spec, X.reshape(-1, 3), mode=0).reshape(4, 5, -1)
    np.testing.assert_allclose(ao, ao2)


def test_jit_and_vmap(h2o):
    spec = GTOSpec.from_molecule(h2o)
    X = jnp.asarray(np.random.default_rng(6).normal(size=(8, 3)))
    f = jax.jit(lambda x: eval_gto(spec, x, mode=2))
    a, g, l = f(X)
    a2, g2, l2 = eval_gto(spec, X, mode=2)
    np.testing.assert_allclose(a, a2)
    # autodiff agreement: jacobian of value == analytic gradient
    jac = jax.vmap(jax.jacobian(lambda x: eval_gto(spec, x[None], mode=0)[0]))(X)
    np.testing.assert_allclose(
        np.transpose(np.asarray(jac), (0, 2, 1)), np.asarray(g), atol=1e-10
    )
