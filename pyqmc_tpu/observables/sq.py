"""Static structure factor S(q) (port of SqAccumulator,
pyqmc/observables/accumulators.py:191-234)."""

import numpy as np
import jax.numpy as jnp


class SqAccumulator:
    def __init__(self, cell=None, qlist=None, nq=4):
        if qlist is None:
            recip = cell.reciprocal()  # rows
            rng = np.arange(-nq, nq + 1)
            pts = np.array(np.meshgrid(rng, rng, rng, indexing="ij")).reshape(3, -1).T
            pts = pts[np.any(pts != 0, axis=1)]
            qlist = pts @ recip
        self.qlist = np.asarray(qlist)

    def __call__(self, wf, params, state, positions, key=None):
        nconf, nelec = positions.shape[:2]
        phase = positions @ jnp.asarray(self.qlist.T, positions.dtype)  # (c, e, q)
        re = jnp.sum(jnp.cos(phase), axis=1)
        im = jnp.sum(jnp.sin(phase), axis=1)
        sq = (re * re + im * im) / nelec
        return {"Sq": sq}

    def avg(self, wf, params, state, positions, key=None):
        dat = self(wf, params, state, positions, key)
        return {k: jnp.mean(v, axis=0) for k, v in dat.items()}

    def keys(self):
        return {"Sq"}

    def shapes(self):
        return {"Sq": (len(self.qlist),)}
