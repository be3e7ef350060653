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
            masks = self._expand_masks(params, to_opt)
        self.masks = masks
        self.indices = [np.nonzero(m.ravel())[0] for m in masks]
        self.sizes = [len(i) for i in self.indices]
        self.nparams = sum(self.sizes)
        self.shapes = [np.shape(l) for l in leaves]

    @staticmethod
    def _expand_masks(params, to_opt):
        """Align to_opt (a tree *prefix* of params: scalar bools broadcast
        over whole subtrees, e.g. a single False for a list of k-point
        coefficient blocks) with the flattened parameter leaves."""
        masks = []

        def rec(p, m):
            if isinstance(m, bool):
                for leaf in jax.tree.leaves(p):
                    masks.append(np.full(np.shape(leaf), m, dtype=bool))
            elif isinstance(m, dict):
                for k in sorted(p.keys()):  # match jax dict flatten order
                    rec(p[k], m[k])
            elif isinstance(m, (list, tuple)):
                for pe, me in zip(p, m):
                    rec(pe, me)
            else:
                masks.append(np.asarray(m, dtype=bool))

        # dict flattening order is sorted keys; mirror it
        if isinstance(params, dict):
            for k in sorted(params.keys()):
                rec(params[k], to_opt[k])
        else:
            rec(params, to_opt)
        return masks

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
