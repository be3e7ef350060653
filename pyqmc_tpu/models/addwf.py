"""Linear superposition Psi = sum_i c_i psi_i (port of pyqmc/wf/addwf.py).

Components are combined in log space with a per-walker reference shift
(addwf.py:37-48); ratios/gradients weight each component by its current
amplitude (addwf.py:75-132).

params: {"coeff": (nwf,), "wf0": ..., "wf1": ...}
"""

import jax.numpy as jnp


class AddWF:
    def __init__(self, *wfs):
        self.wfs = tuple(wfs)
        self.nelec = wfs[0].nelec
        for w in wfs:
            if getattr(w, "ratio_is_modulus", False):
                raise ValueError(
                    "AddWF needs component phases/signed ratios; the "
                    "real-backend twist paths (ratio_is_modulus) report "
                    "|ratio| only — superpose the complex Slater instead"
                )

    def make_params(self):
        p = {f"wf{i}": w.make_params() for i, w in enumerate(self.wfs)}
        p["coeff"] = jnp.ones(len(self.wfs)) / jnp.sqrt(float(len(self.wfs)))
        return p

    def _split(self, params):
        return [params[f"wf{i}"] for i in range(len(self.wfs))]

    def recompute(self, params, positions):
        return tuple(
            w.recompute(p, positions) for w, p in zip(self.wfs, self._split(params))
        )

    def _amplitudes(self, params, state):
        """w_i = c_i phase_i e^{la_i - ref}: (nwf, nconf) and denom (nconf,)."""
        phases, las = [], []
        for w, p, s in zip(self.wfs, self._split(params), state):
            ph, la = w.value(p, s)
            phases.append(ph)
            las.append(la)
        las = jnp.stack(las)  # (nwf, nconf)
        phases = jnp.stack(phases)
        ref = jnp.max(las, axis=0, keepdims=True)
        w = params["coeff"][:, None] * phases * jnp.exp(las - ref)
        return w, jnp.sum(w, axis=0), ref[0]

    def value(self, params, state):
        w, denom, ref = self._amplitudes(params, state)
        absd = jnp.abs(denom)
        safe = jnp.where(absd == 0, 1e-30, absd)
        return denom / safe, jnp.log(safe) + ref

    def testvalue(self, params, state, e, epos):
        w, denom, _ = self._amplitudes(params, state)
        num = None
        saved = []
        for i, (wf, p, s) in enumerate(zip(self.wfs, self._split(params), state)):
            r, sv = wf.testvalue(p, s, e, epos)
            contrib = (
                w[i][:, None] * r if r.ndim == 2 else w[i] * r
            )
            num = contrib if num is None else num + contrib
            saved.append(sv)
        denom_b = denom[:, None] if num.ndim == 2 else denom
        return num / denom_b, tuple(saved)

    def testvalue_many(self, params, state, epos):
        w, denom, _ = self._amplitudes(params, state)
        num = None
        for i, (wf, p, s) in enumerate(zip(self.wfs, self._split(params), state)):
            r = wf.testvalue_many(p, s, epos)
            contrib = w[i][:, None] * r
            num = contrib if num is None else num + contrib
        return num / denom[:, None]

    def gradient_value(self, params, state, e, epos):
        w, denom, _ = self._amplitudes(params, state)
        num_r = None
        num_g = None
        saved = []
        for i, (wf, p, s) in enumerate(zip(self.wfs, self._split(params), state)):
            g, r, sv = wf.gradient_value(p, s, e, epos)
            wr = w[i] * r  # amplitude at epos
            num_r = wr if num_r is None else num_r + wr
            num_g = wr[:, None] * g if num_g is None else num_g + wr[:, None] * g
            saved.append(sv)
        ratio = num_r / denom
        grad = num_g / num_r[:, None]
        return grad, ratio, tuple(saved)

    def gradient(self, params, state, e, epos):
        g, _, _ = self.gradient_value(params, state, e, epos)
        return g

    def gradient_current(self, params, state, e, epos):
        """grad log Psi at electron e's CURRENT position: each component's
        testvalue ratio at its own position is exactly 1, so the amplitude
        weights w_i alone combine the cached component gradients."""
        w, denom, _ = self._amplitudes(params, state)
        num_g = None
        for i, (wf, p, s) in enumerate(zip(self.wfs, self._split(params), state)):
            if hasattr(wf, "gradient_current"):
                g = wf.gradient_current(p, s, e, epos)
            else:
                g = wf.gradient(p, s, e, epos)
            gc = w[i][:, None] * g
            num_g = gc if num_g is None else num_g + gc
        return num_g / denom[:, None]

    def gradient_laplacian(self, params, state, e, epos):
        w, denom, _ = self._amplitudes(params, state)
        num_r, num_g, num_l = None, None, None
        for i, (wf, p, s) in enumerate(zip(self.wfs, self._split(params), state)):
            g, l = wf.gradient_laplacian(p, s, e, epos)
            r, _ = wf.testvalue(p, s, e, epos)
            wr = w[i] * r
            num_r = wr if num_r is None else num_r + wr
            gc = wr[:, None] * g
            lc = wr * l
            num_g = gc if num_g is None else num_g + gc
            num_l = lc if num_l is None else num_l + lc
        return num_g / num_r[:, None], num_l / num_r

    def updateinternals(self, params, state, e, epos, mask, saved):
        return tuple(
            w.updateinternals(p, s, e, epos, mask, sv)
            for w, p, s, sv in zip(self.wfs, self._split(params), state, saved)
        )

    def pgradient(self, params, positions):
        import jax

        def single(pos):
            def logabs(p):
                st = self.recompute(p, pos[None])
                _, la = self.value(p, st)
                return la[0]

            return jax.grad(logabs)(params)

        return jax.vmap(single)(positions)
