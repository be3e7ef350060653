"""Flatten/unflatten the optimizable subset of wavefunction parameters.

Port of LinearTransform (pyqmc/observables/accumulators.py:98-185): boolean
to_opt masks select which entries of the parameter pytree are optimized;
serialization uses static gather indices so it works under jit.

Complex parameters (general-twist k-point wavefunctions) are split into
independent real/imaginary optimization directions, mirroring the
reference's complex handling (accumulators.py:122-185): the flat vector is
[real parts of all selected entries, imaginary parts of the complex ones],
and gradients are serialized as a REAL (R, I) pair so everything downstream
(SR accumulation inside the jitted block) stays in real arithmetic — the
TPU backend implements no complex ops.

For a complex parameter p = a + ib with dlnPsi/dp = O:
    d lnPsi / da = O          -> slot in the real segment, (R, I) = (Re O, Im O)
    d lnPsi / db = i O        -> slot in the imag segment, (R, I) = (-Im O, Re O)
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


class LinearTransform:
    def __init__(self, params, to_opt: Dict[str, object] = None):
        """to_opt: pytree prefix of params; leaves are boolean arrays or
        True/False scalars broadcast over whole subtrees. Default: all."""
        leaves, treedef = jax.tree.flatten(params)
        self.treedef = treedef
        if to_opt is None:
            masks = [np.ones(np.shape(l), dtype=bool) for l in leaves]
        else:
            masks = self._expand_masks(params, to_opt)
        self.masks = masks
        self.indices = [np.nonzero(m.ravel())[0] for m in masks]
        self.sizes = [len(i) for i in self.indices]
        self.is_complex = [bool(jnp.iscomplexobj(l)) for l in leaves]
        # layout: [all selected entries (real part), selected complex entries
        # (imaginary part)]
        self.nreal = sum(self.sizes)
        self.complex_inds = np.concatenate(
            [np.full(n, c, dtype=bool) for n, c in zip(self.sizes, self.is_complex)]
        ) if self.sizes else np.zeros(0, dtype=bool)
        self.nimag = int(self.complex_inds.sum())
        self.nparams = self.nreal + self.nimag
        self.has_complex_params = self.nimag > 0
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

    def _gather(self, params):
        """Selected entries of each leaf, concatenated (complex preserved)."""
        leaves = jax.tree.leaves(params)
        parts = [
            l.reshape(-1)[jnp.asarray(idx)]
            for l, idx in zip(leaves, self.indices)
            if len(idx)
        ]
        return parts

    def serialize(self, params):
        """params pytree -> flat REAL (nparams,) vector (jit-safe):
        [re(selected), im(selected complex)]."""
        parts = self._gather(params)
        if not parts:
            return jnp.zeros(0)
        flat = jnp.concatenate(parts)
        re = jnp.real(flat)
        if not self.has_complex_params:
            return re
        return jnp.concatenate([re, jnp.imag(flat[self.complex_inds])])

    def serialize_batch(self, pytree):
        """pytree of (nconf, ...) -> REAL (nconf, nparams) gradient matrix.

        Kept for real-only wavefunctions (raises on complex input to avoid a
        silently dropped imaginary part); use serialize_gradients_pair for
        the general case.
        """
        R, I = self.serialize_gradients_pair(pytree)
        if I is not None:
            raise ValueError(
                "complex parameter gradients need serialize_gradients_pair"
            )
        return R

    def serialize_gradients_pair(self, pytree):
        """pytree of (nconf, ...) dlnPsi/dp -> (R, I) real matrices of shape
        (nconf, nparams), the real/imaginary parts of dlnPsi along each real
        optimization direction. I is None when every gradient (and every
        parameter) is real — the common TPU path — so callers can skip the
        imaginary-channel work statically."""
        leaves = jax.tree.leaves(pytree)
        parts = [
            l.reshape(l.shape[0], -1)[:, jnp.asarray(idx)]
            for l, idx in zip(leaves, self.indices)
            if len(idx)
        ]
        if not parts:
            z = jnp.zeros((0, 0))
            return z, None
        g = jnp.concatenate(parts, axis=1)  # (nconf, nreal), maybe complex
        any_complex_grad = jnp.iscomplexobj(g)
        if not any_complex_grad and not self.has_complex_params:
            return g, None
        gr, gi = jnp.real(g), (jnp.imag(g) if any_complex_grad else jnp.zeros_like(jnp.real(g)))
        if not self.has_complex_params:
            return gr, gi
        ci = self.complex_inds
        # imag-direction slots: dlnPsi/db = i O -> (R, I) = (-Im O, Re O)
        R = jnp.concatenate([gr, -gi[:, ci]], axis=1)
        I = jnp.concatenate([gi, gr[:, ci]], axis=1)
        return R, I

    def deserialize(self, base_params, flat):
        """Scatter a flat REAL vector back into a copy of base_params,
        recombining re/im segments for complex leaves."""
        leaves = jax.tree.leaves(base_params)
        out = []
        off = 0
        imoff = self.nreal
        for l, idx, n, c in zip(leaves, self.indices, self.sizes, self.is_complex):
            if n:
                vals = flat[off : off + n]
                if c:
                    vals = vals + 1j * flat[imoff : imoff + n]
                    imoff += n
                vals = vals.astype(l.dtype)
                newl = l.reshape(-1).at[jnp.asarray(idx)].set(vals)
                out.append(newl.reshape(l.shape))
                off += n
            else:
                out.append(l)
        return jax.tree.unflatten(self.treedef, out)
