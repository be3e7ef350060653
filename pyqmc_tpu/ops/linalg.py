"""Determinant linear algebra for Slater wavefunctions.

Sherman-Morrison row updates (cf. pyqmc/wf/slater.py:23-29,88-94) vectorized
over walkers and determinants, and slogdet+inverse helpers.

TPU note: XLA:TPU implements LU decomposition only for f32/c64, so
slogdet_inv runs in the input dtype (f64 works on CPU tests; production TPU
runs f32/c64 and relies on periodic full recomputes to control drift).
"""

import jax.numpy as jnp


def slogdet_inv(a):
    """(phase, logabsdet, inverse) for batched square matrices.

    phase is +-1 for real dtypes, unit-modulus complex for complex dtypes.
    """
    phase, logabs = jnp.linalg.slogdet(a)
    # jnp.linalg.inv broadcasts an unbatched identity, which breaks under
    # walker-axis sharding ("inconsistent axis specs"); solve against an
    # explicitly batched identity instead.
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    inv = jnp.linalg.solve(a, eye) if n > 0 else jnp.zeros_like(a)
    return phase, logabs, inv


def sherman_morrison_row(inv, new_row, row_idx):
    """Rank-1 update of inverse after replacing one matrix row.

    Args:
      inv: (..., n, n) inverse of A (inv @ A = I).
      new_row: (..., n) replacement for A[..., row_idx, :].
      row_idx: traced or static scalar row index.

    Returns:
      (ratio, new_inv): ratio = det(A_new)/det(A) (... ,), and the updated
      inverse, O(n^2) per matrix.
    """
    # t_j = new_row . inv[:, j]
    t = jnp.einsum("...k,...kj->...j", new_row, inv)
    ratio = t[..., row_idx]
    col = inv[..., :, row_idx]  # (..., n)
    inv_new = inv - jnp.einsum("...i,...j->...ij", col, t) / ratio[..., None, None]
    inv_new = inv_new.at[..., :, row_idx].set(col / ratio[..., None])
    return ratio, inv_new
