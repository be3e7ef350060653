"""Precision policy for the TPU build.

The reference (pyqmc) runs float64 numpy everywhere. On TPU:
  * elementwise/matmul f64 is available (software assisted) but slow,
  * LU decomposition (slogdet/inv) is only implemented for f32 / c64.

Policy: all hot-path arrays take their dtype from the inputs; the framework is
dtype-agnostic. Helpers here pick defaults: f64 when jax_enable_x64 is on
(CPU tests), else f32 (TPU production). Determinant-heavy code stabilizes f32
with periodic full recomputes (see models/slater.py).
"""

import jax
import jax.numpy as jnp


def real_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def complex_dtype():
    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64


def int_dtype():
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


def is_complex(x) -> bool:
    return jnp.iscomplexobj(x)
