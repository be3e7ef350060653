"""Static structure factor S(q) and spin structure factor
(port of SqAccumulator, pyqmc/observables/accumulators.py:191-234).

  S(q)      = <|sum_j e^{iq.r_j}|^2> / N
  S_spin(q) = <|sum_j s_j e^{iq.r_j}|^2> / N,  s_j = +1 up / -1 down
"""

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
        self.nup = None if cell is None else cell.nelec[0]

    def __call__(self, wf, params, state, positions, key=None):
        nconf, nelec = positions.shape[:2]
        phase = positions @ jnp.asarray(self.qlist.T, positions.dtype)  # (c, e, q)
        cos, sin = jnp.cos(phase), jnp.sin(phase)
        re = jnp.sum(cos, axis=1)
        im = jnp.sum(sin, axis=1)
        out = {"Sq": (re * re + im * im) / nelec}
        nup = nelec if self.nup is None else self.nup
        s = jnp.where(jnp.arange(nelec) < nup, 1.0, -1.0).astype(
            positions.dtype
        )[None, :, None]
        re_s = jnp.sum(s * cos, axis=1)
        im_s = jnp.sum(s * sin, axis=1)
        out["spinSq"] = (re_s * re_s + im_s * im_s) / nelec
        return out

    def avg(self, wf, params, state, positions, key=None):
        dat = self(wf, params, state, positions, key)
        return {k: jnp.mean(v, axis=0) for k, v in dat.items()}

    def keys(self):
        return {"Sq", "spinSq"}

    def shapes(self):
        return {"Sq": (len(self.qlist),), "spinSq": (len(self.qlist),)}
