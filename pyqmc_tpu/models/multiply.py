"""Product wavefunction Psi = prod_i psi_i (port of pyqmc/wf/multiplywf.py).

Parameters are namespaced {"wf0": ..., "wf1": ...} (Parameters-class
semantics, multiplywf.py:18-68); states are tuples. The laplacian cross term
uses sum_{i != j} g_i.g_j = |sum_i g_i|^2 - sum_i |g_i|^2
(multiplywf.py:121-129).
"""

import jax.numpy as jnp


class MultiplyWF:
    def __init__(self, *wfs):
        self.wfs = tuple(wfs)
        self.nelec = wfs[0].nelec

    def make_params(self):
        return {f"wf{i}": w.make_params() for i, w in enumerate(self.wfs)}

    def _split(self, params):
        return [params[f"wf{i}"] for i in range(len(self.wfs))]

    def recompute(self, params, positions):
        return tuple(
            w.recompute(p, positions) for w, p in zip(self.wfs, self._split(params))
        )

    def value(self, params, state):
        phase = None
        logabs = None
        for w, p, s in zip(self.wfs, self._split(params), state):
            ph, la = w.value(p, s)
            phase = ph if phase is None else phase * ph
            logabs = la if logabs is None else logabs + la
        return phase, logabs

    def testvalue(self, params, state, e, epos):
        ratio = None
        saved = []
        for w, p, s in zip(self.wfs, self._split(params), state):
            r, sv = w.testvalue(p, s, e, epos)
            ratio = r if ratio is None else ratio * r
            saved.append(sv)
        return ratio, tuple(saved)

    def testvalue_many(self, params, state, epos):
        ratio = None
        for w, p, s in zip(self.wfs, self._split(params), state):
            r = w.testvalue_many(p, s, epos)
            ratio = r if ratio is None else ratio * r
        return ratio

    def gradient(self, params, state, e, epos):
        g = None
        for w, p, s in zip(self.wfs, self._split(params), state):
            gi = w.gradient(p, s, e, epos)
            g = gi if g is None else g + gi
        return g

    def gradient_value_pair(self, params, state, e, epos_old, epos_new):
        go, gn, ratio, saved = None, None, None, []
        for w, p, s in zip(self.wfs, self._split(params), state):
            goi, gni, ri, svi = w.gradient_value_pair(p, s, e, epos_old, epos_new)
            go = goi if go is None else go + goi
            gn = gni if gn is None else gn + gni
            ratio = ri if ratio is None else ratio * ri
            saved.append(svi)
        return go, gn, ratio, tuple(saved)

    def gradient_value(self, params, state, e, epos):
        g, ratio, saved = None, None, []
        for w, p, s in zip(self.wfs, self._split(params), state):
            gi, ri, svi = w.gradient_value(p, s, e, epos)
            g = gi if g is None else g + gi
            ratio = ri if ratio is None else ratio * ri
            saved.append(svi)
        return g, ratio, tuple(saved)

    def gradient_laplacian(self, params, state, e, epos):
        gs, laps = [], []
        for w, p, s in zip(self.wfs, self._split(params), state):
            gi, li = w.gradient_laplacian(p, s, e, epos)
            gs.append(gi)
            laps.append(li)
        gtot = sum(gs)
        cross = jnp.sum(gtot * gtot, axis=-1) - sum(
            jnp.sum(g * g, axis=-1) for g in gs
        )
        return gtot, sum(laps) + cross

    def updateinternals(self, params, state, e, epos, mask, saved):
        return tuple(
            w.updateinternals(p, s, e, epos, mask, sv)
            for w, p, s, sv in zip(self.wfs, self._split(params), state, saved)
        )

    def pgradient(self, params, positions):
        return {
            f"wf{i}": w.pgradient(p, positions)
            for i, (w, p) in enumerate(zip(self.wfs, self._split(params)))
        }
