"""Determinant linear algebra for Slater wavefunctions.

Sherman-Morrison row updates (cf. pyqmc/wf/slater.py:23-29,88-94) vectorized
over walkers and determinants, and slogdet+inverse helpers.

TPU note: XLA:TPU implements LU decomposition only for f32/c64, so
slogdet_inv runs in the input dtype (f64 works on CPU tests; production TPU
runs f32/c64 and relies on periodic full recomputes to control drift).
"""

import jax
import jax.numpy as jnp


def _lu_slogdet_inv(a):
    """Batched LU (partial pivoting) + slogdet + inverse in pure jnp.

    Needed because XLA:TPU's LuDecomposition does not support complex
    inputs (observed UNIMPLEMENTED for c64 on v5e); written as a fori_loop
    of rank-1 updates, vectorized over the batch. O(n^3) with n sequential
    steps — fine for determinant blocks (n <= O(100)).
    """
    batch = a.shape[:-2]
    n = a.shape[-1]
    A = a.reshape((-1, n, n))
    B = A.shape[0]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), A.shape)
    # augment: carry inverse-building RHS through the same elimination
    X = eye
    phase = jnp.ones(B, dtype=a.dtype)
    logabs = jnp.zeros(B, dtype=jnp.real(a).dtype)

    def body(k, carry):
        A, X, phase, logabs = carry
        col = A[:, :, k]
        mask = jnp.arange(n) >= k
        mag = jnp.where(mask[None, :], jnp.abs(col), -1.0)
        piv = jnp.argmax(mag, axis=1)  # (B,)
        # swap rows k <-> piv (gather-based batched row swap)
        idx = jnp.broadcast_to(jnp.arange(n)[None, :], (B, n))
        idx = idx.at[:, k].set(piv)
        idx = jnp.where(
            (jnp.arange(n)[None, :] == piv[:, None]), k, idx
        )
        A = jnp.take_along_axis(A, idx[:, :, None], axis=1)
        X = jnp.take_along_axis(X, idx[:, :, None], axis=1)
        swapped = piv != k
        phase = phase * jnp.where(swapped, -1.0, 1.0)
        pivot = A[:, k, k]
        absp = jnp.abs(pivot)
        safe = jnp.where(absp == 0, 1.0, absp)
        phase = phase * jnp.where(absp == 0, 1.0, pivot / safe)
        tiny = jnp.finfo(logabs.dtype).tiny
        logabs = logabs + jnp.log(jnp.where(absp == 0, tiny, absp))
        # eliminate column k from all other rows (Gauss-Jordan)
        factor = A[:, :, k] / pivot[:, None]  # (B, n)
        sel = (jnp.arange(n) != k).astype(a.dtype)  # rows other than k
        factor = factor * sel[None, :]
        A = A - factor[:, :, None] * A[:, k, :][:, None, :]
        X = X - factor[:, :, None] * X[:, k, :][:, None, :]
        return A, X, phase, logabs

    A, X, phase, logabs = jax.lax.fori_loop(0, n, body, (A, X, phase, logabs))
    # A is now diagonal; finish the inverse
    d = jnp.diagonal(A, axis1=1, axis2=2)  # (B, n)
    inv = X / d[:, :, None]
    return (
        phase.reshape(batch),
        logabs.reshape(batch),
        inv.reshape(a.shape),
    )


def slogdet_inv(a):
    """(phase, logabsdet, inverse) for batched square matrices.

    phase is +-1 for real dtypes, unit-modulus complex for complex dtypes.
    On TPU, complex inputs AND small real blocks take the custom batched
    Gauss-Jordan path: XLA:TPU has no complex LuDecomposition, and its
    LuDecompositionBlock custom-call is catastrophically slow for tiny
    batched matrices (measured 2.1 ms per call for (2048, 4, 4) on v5e —
    ~8 ms of every VMC block's recompute; the n sequential rank-1 updates
    of the jnp path are microseconds of VPU work).
    """
    n = a.shape[-1]
    if n == 0:
        shape = a.shape[:-2]
        one = jnp.ones(shape, dtype=a.dtype)
        return one, jnp.zeros(shape, jnp.real(a).dtype), jnp.zeros_like(a)
    if jax.default_backend() == "tpu" and (jnp.iscomplexobj(a) or n <= 32):
        return _lu_slogdet_inv(a)
    phase, logabs = jnp.linalg.slogdet(a)
    # jnp.linalg.inv broadcasts an unbatched identity, which breaks under
    # walker-axis sharding ("inconsistent axis specs"); solve against an
    # explicitly batched identity instead.
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    inv = jnp.linalg.solve(a, eye)
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
