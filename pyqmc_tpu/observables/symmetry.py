"""Symmetry-operator expectation <S Psi / Psi>
(port of pyqmc/observables/accumulators.py:237-340).

For a point-group operation O (3x3 orthogonal matrix, optionally with an
origin), the accumulator evaluates Psi(O R)/Psi(R) per walker via a full
recompute at the transformed coordinates. Periodic variant rewraps into the
cell first.
"""

import numpy as np
import jax.numpy as jnp


class SymmetryAccumulator:
    def __init__(self, mol, operations, origin=None, names=None):
        """operations: list of (3,3) matrices acting about `origin`."""
        self.ops = [np.asarray(o, dtype=np.float64) for o in operations]
        self.origin = (
            np.zeros(3) if origin is None else np.asarray(origin, dtype=np.float64)
        )
        self.names = names or [f"op{i}" for i in range(len(self.ops))]
        self.lattice = getattr(mol, "lattice", None)

    def __call__(self, wf, params, state, positions, key=None):
        # real-backend twist wavefunctions report phase=1 from value();
        # PairKSlater exposes the true phase as a real pair (value_pair) —
        # required for Re[(ph/ph0) e^(la-la0)] to be meaningful
        use_pair = getattr(wf, "ratio_is_modulus", False)
        if use_pair and not hasattr(wf, "value_pair"):
            raise ValueError(
                "SymmetryAccumulator needs the wavefunction phase; this "
                "real-backend wavefunction reports |Psi| only (use "
                "PairKSlater or the complex path)"
            )
        if use_pair:
            pr0, pi0, la0 = wf.value_pair(params, state)
        else:
            ph0, la0 = wf.value(params, state)
        out = {}
        o = jnp.asarray(self.origin, positions.dtype)
        for name, op in zip(self.names, self.ops):
            newpos = (positions - o) @ jnp.asarray(op.T, positions.dtype) + o
            if self.lattice is not None:
                from ..ops.pbc import enforce_pbc

                lat = jnp.asarray(self.lattice, positions.dtype)
                newpos, _ = enforce_pbc(lat, jnp.linalg.inv(lat), newpos)
            st = wf.recompute(params, newpos)
            if use_pair:
                pr, pi, la = wf.value_pair(params, st)
                # Re[ph conj(ph0)] e^(la - la0), |ph| = 1
                out[name] = (pr * pr0 + pi * pi0) * jnp.exp(la - la0)
            else:
                ph, la = wf.value(params, st)
                out[name] = jnp.real((ph / ph0) * jnp.exp(la - la0))
        return out

    def avg(self, wf, params, state, positions, key=None):
        dat = self(wf, params, state, positions, key)
        return {k: jnp.mean(v, axis=0) for k, v in dat.items()}

    def keys(self):
        return set(self.names)

    def shapes(self):
        return {n: () for n in self.names}
