"""Flatten/unflatten the optimizable subset of wavefunction parameters.

Port of LinearTransform (pyqmc/observables/accumulators.py:98-185): boolean
to_opt masks select which entries of the parameter pytree are optimized;
serialization uses static gather indices so it works under jit.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


class LinearTransform:
    def __init__(self, params, to_opt: Dict[str, object] = None):
        """to_opt: pytree with same structure; leaves are boolean arrays or
        True/False scalars. Default: optimize every leaf except any named
        'det_coeff' first entry... (caller decides; default = all)."""
        leaves, treedef = jax.tree.flatten(params)
        self.treedef = treedef
        if to_opt is None:
            masks = [np.ones(np.shape(l), dtype=bool) for l in leaves]
        else:
            mleaves, mdef = jax.tree.flatten(
                to_opt, is_leaf=lambda x: isinstance(x, (bool, np.ndarray))
            )
            masks = []
            for l, m in zip(leaves, mleaves):
                if isinstance(m, bool):
                    masks.append(np.full(np.shape(l), m, dtype=bool))
                else:
                    masks.append(np.asarray(m, dtype=bool))
        self.masks = masks
        self.indices = [np.nonzero(m.ravel())[0] for m in masks]
        self.sizes = [len(i) for i in self.indices]
        self.nparams = sum(self.sizes)
        self.shapes = [np.shape(l) for l in leaves]

    def serialize(self, params):
        """params pytree -> flat (nparams,) vector (jit-safe)."""
        leaves = jax.tree.leaves(params)
        parts = [
            l.reshape(-1)[jnp.asarray(idx)]
            for l, idx in zip(leaves, self.indices)
            if len(idx)
        ]
        return jnp.concatenate(parts) if parts else jnp.zeros(0)

    def serialize_batch(self, pytree):
        """pytree of (nconf, ...) -> (nconf, nparams)."""
        leaves = jax.tree.leaves(pytree)
        parts = [
            l.reshape(l.shape[0], -1)[:, jnp.asarray(idx)]
            for l, idx in zip(leaves, self.indices)
            if len(idx)
        ]
        return jnp.concatenate(parts, axis=1)

    def deserialize(self, base_params, flat):
        """Scatter flat vector back into a copy of base_params."""
        leaves = jax.tree.leaves(base_params)
        out = []
        off = 0
        for l, idx, n in zip(leaves, self.indices, self.sizes):
            if n:
                newl = l.reshape(-1).at[jnp.asarray(idx)].set(flat[off : off + n])
                out.append(newl.reshape(l.shape))
                off += n
            else:
                out.append(l)
        return jax.tree.unflatten(self.treedef, out)
