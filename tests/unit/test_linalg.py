"""Custom batched LU (slogdet+inverse) vs numpy, incl. complex and
near-singular matrices (cf. reference tests/unit/test_sherman_morrison.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyqmc_tpu.ops.linalg import _lu_slogdet_inv, slogdet_inv, sherman_morrison_row


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_custom_lu(dtype):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(12, 7, 7))
    if np.issubdtype(dtype, np.complexfloating):
        A = A + 1j * rng.normal(size=A.shape)
    A = A.astype(dtype)
    ph, la, inv = _lu_slogdet_inv(jnp.asarray(A))
    ph_ref, la_ref = np.linalg.slogdet(A)
    np.testing.assert_allclose(np.asarray(la), la_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ph), ph_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(A), atol=1e-10)


def test_custom_lu_near_singular():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(5, 6, 6))
    A[:, 3] = A[:, 2] + 1e-9 * rng.normal(size=(5, 6))  # nearly dependent rows
    ph, la, inv = _lu_slogdet_inv(jnp.asarray(A))
    ph_ref, la_ref = np.linalg.slogdet(A)
    np.testing.assert_allclose(np.asarray(la), la_ref, rtol=1e-5)
    resid = np.einsum("bij,bjk->bik", np.asarray(inv), A) - np.eye(6)
    assert np.max(np.abs(resid)) < 1e-4


def test_sherman_morrison_near_singular():
    """SM update stays accurate with engineered near-singular matrices
    (test_sherman_morrison.py:20-51 criterion)."""
    rng = np.random.default_rng(2)
    A = rng.normal(size=(4, 5, 5))
    inv = np.linalg.inv(A)
    new_row = rng.normal(size=(4, 5))
    for row in range(5):
        r, inv_new = sherman_morrison_row(jnp.asarray(inv), jnp.asarray(new_row), row)
        A2 = A.copy()
        A2[:, row, :] = new_row
        np.testing.assert_allclose(
            np.asarray(r), np.linalg.det(A2) / np.linalg.det(A), rtol=1e-10
        )
        np.testing.assert_allclose(np.asarray(inv_new), np.linalg.inv(A2), atol=1e-8)
