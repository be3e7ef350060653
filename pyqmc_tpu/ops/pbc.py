"""Periodic-boundary wrap.

Functional equivalent of the reference's enforce_pbc (pyqmc/pbc/pbc.py:18-49):
fold positions into the cell spanned by the rows of `lattice` and return the
integer wrap counts (needed for k-point phase factors e^{i k.R_wrap}).

Pure jnp, batched over any leading axes; jit/vmap/shard_map safe.
"""

import jax.numpy as jnp


def enforce_pbc(lattice, lattice_inv, epos):
    """Fold epos (..., 3) into the cell.

    Args:
      lattice: (3, 3), rows are lattice vectors a_i.
      lattice_inv: (3, 3), inverse of lattice.
      epos: (..., 3) cartesian positions.

    Returns:
      (wrapped_epos, wrap) where wrap (..., 3) is the integer number of cell
      translations removed along each lattice vector.
    """
    frac = epos @ lattice_inv
    wrap = jnp.floor(frac)
    wrapped = (frac - wrap) @ lattice
    return wrapped, wrap.astype(jnp.int32)
