"""Product wavefunction Psi = prod_i psi_i (port of pyqmc/wf/multiplywf.py).

Parameters are namespaced {"wf0": ..., "wf1": ...} (Parameters-class
semantics, multiplywf.py:18-68); states are tuples. The laplacian cross term
uses sum_{i != j} g_i.g_j = |sum_i g_i|^2 - sum_i |g_i|^2
(multiplywf.py:121-129).
"""

import jax
import jax.numpy as jnp


def default_move_begin(w, params, state, e, epos):
    """Metropolis move protocol with graceful degradation.

    A move is evaluated in two halves: begin(old position) -> (grad_old,
    aux), finish(new position, aux) -> (grad_new, ratio, saved). Kernel-
    aware wavefunctions implement move_begin/move_finish to share work
    between the halves (Slater reads its orbital cache; Jastrows reuse
    u_old); anything else falls back to gradient_current/gradient +
    gradient_value."""
    if hasattr(w, "move_begin"):
        return w.move_begin(params, state, e, epos)
    if hasattr(w, "gradient_current"):
        return w.gradient_current(params, state, e, epos), None
    return w.gradient(params, state, e, epos), None


def default_move_finish(w, params, state, e, epos, aux):
    if hasattr(w, "move_finish"):
        return w.move_finish(params, state, e, epos, aux)
    return w.gradient_value(params, state, e, epos)


def default_testvalue_aux_all(w, params, state, aux, es=None):
    """Ratios (ne, nconf, naux) for replacing electron es[i] with its own
    aux points aux[i] (ne, nconf, naux, 3) — the ECP quadrature access
    pattern. es None means aux covers ALL electrons in order; otherwise es
    is a STATIC sequence of electron indices (the ECP pass chunks electrons
    to bound the aux-point batch, and the chunks carry arbitrary mixed-spin
    subsets). Wavefunctions whose per-point cost is dominated by an
    electron-INDEPENDENT kernel (Slater: the orbital evaluation) implement
    testvalue_aux_all to hoist that kernel out of the electron vmap into one
    flat call; everything else falls back to vmapped testvalue."""
    if hasattr(w, "testvalue_aux_all"):
        return w.testvalue_aux_all(params, state, aux, es=es)
    es = jnp.arange(aux.shape[0]) if es is None else jnp.asarray(es)
    return jax.vmap(
        lambda e, a: w.testvalue(params, state, e, a)[0]
    )(es, aux)


class MultiplyWF:
    def __init__(self, *wfs):
        self.wfs = tuple(wfs)
        self.nelec = wfs[0].nelec
        # True when some factor's testvalue returns |ratio| with the
        # sign/phase only available through testvalue_pair (real-backend
        # twist paths); accumulators that need Re(ratio) check this flag.
        self.ratio_is_modulus = any(
            getattr(w, "ratio_is_modulus", False) for w in wfs
        )

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

    def testvalue_pair(self, params, state, e, epos):
        """(re, im) ratio pair of the product: complex-pair multiply across
        factors. Factors without a pair method contribute their (real)
        testvalue ratio to both components. Present iff some factor defines
        testvalue_pair (real-backend twist paths)."""
        rr, ri = None, None
        saved = []
        for w, p, s in zip(self.wfs, self._split(params), state):
            if hasattr(w, "testvalue_pair"):
                wr, wi, sv = w.testvalue_pair(p, s, e, epos)
            else:
                wr, sv = w.testvalue(p, s, e, epos)
                wi = jnp.zeros_like(wr)
            if rr is None:
                rr, ri = wr, wi
            else:
                rr, ri = rr * wr - ri * wi, rr * wi + ri * wr
            saved.append(sv)
        return rr, ri, tuple(saved)

    def testvalue_many(self, params, state, epos):
        ratio = None
        for w, p, s in zip(self.wfs, self._split(params), state):
            r = w.testvalue_many(p, s, epos)
            ratio = r if ratio is None else ratio * r
        return ratio

    def testvalue_many_pair(self, params, state, epos):
        """(re, im) all-electron ratio pairs of the product."""
        rr, ri = None, None
        for w, p, s in zip(self.wfs, self._split(params), state):
            if hasattr(w, "testvalue_many_pair"):
                wr, wi = w.testvalue_many_pair(p, s, epos)
            else:
                wr = w.testvalue_many(p, s, epos)
                wi = jnp.zeros_like(wr)
            if rr is None:
                rr, ri = wr, wi
            else:
                rr, ri = rr * wr - ri * wi, rr * wi + ri * wr
        return rr, ri

    def gradient(self, params, state, e, epos):
        g = None
        for w, p, s in zip(self.wfs, self._split(params), state):
            gi = w.gradient(p, s, e, epos)
            g = gi if g is None else g + gi
        return g

    def gradient_current(self, params, state, e, epos):
        """grad log Psi at electron e's current position `epos`; factors
        with an orbital cache (Slater.gradient_current) skip their AO
        evaluation, the rest evaluate at epos."""
        g = None
        for w, p, s in zip(self.wfs, self._split(params), state):
            if hasattr(w, "gradient_current"):
                gi = w.gradient_current(p, s, e, epos)
            else:
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

    def testvalue_aux_all(self, params, state, aux, es=None):
        """Product of per-factor aux-all ratios (see
        default_testvalue_aux_all)."""
        ratio = None
        for w, p, s in zip(self.wfs, self._split(params), state):
            ri = default_testvalue_aux_all(w, p, s, aux, es=es)
            ratio = ri if ratio is None else ratio * ri
        return ratio

    def move_begin(self, params, state, e, epos):
        """Move protocol (method/vmc.py sweep): per-factor begin with
        fallback, aux is the tuple of factor auxes."""
        g, aux = None, []
        for w, p, s in zip(self.wfs, self._split(params), state):
            gi, ai = default_move_begin(w, p, s, e, epos)
            g = gi if g is None else g + gi
            aux.append(ai)
        return g, tuple(aux)

    def move_finish(self, params, state, e, epos, aux):
        g, ratio, saved = None, None, []
        for w, p, s, a in zip(self.wfs, self._split(params), state, aux):
            gi, ri, svi = default_move_finish(w, p, s, e, epos, a)
            g = gi if g is None else g + gi
            ratio = ri if ratio is None else ratio * ri
            saved.append(svi)
        return g, ratio, tuple(saved)

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

    def gradient_laplacian_pair(self, params, state, e, epos):
        """Complex grad log Psi and lap Psi/Psi of the product as REAL
        (re, im) pairs; factors without a pair method (real wavefunctions,
        e.g. Jastrows) contribute zero imaginary parts. The cross term is
        the COMPLEX square (sum g)^2 - sum g^2, not the modulus."""
        grs, gis, lrs, lis = [], [], [], []
        for w, p, s in zip(self.wfs, self._split(params), state):
            if hasattr(w, "gradient_laplacian_pair"):
                gr, gi, lr, li = w.gradient_laplacian_pair(p, s, e, epos)
            else:
                gr, lr = w.gradient_laplacian(p, s, e, epos)
                gi, li = jnp.zeros_like(gr), jnp.zeros_like(lr)
            grs.append(gr); gis.append(gi); lrs.append(lr); lis.append(li)
        gtr, gti = sum(grs), sum(gis)
        cross_re = (
            jnp.sum(gtr * gtr - gti * gti, axis=-1)
            - sum(jnp.sum(g * g - h * h, axis=-1) for g, h in zip(grs, gis))
        )
        cross_im = 2.0 * (
            jnp.sum(gtr * gti, axis=-1)
            - sum(jnp.sum(g * h, axis=-1) for g, h in zip(grs, gis))
        )
        return gtr, gti, sum(lrs) + cross_re, sum(lis) + cross_im

    def pgradient_pair(self, params, positions):
        """(re, im) parameter-gradient trees of the product (im = phase
        channel; zeros for factors without pgradient_pair)."""
        re_tree, im_tree = {}, {}
        for i, (w, p) in enumerate(zip(self.wfs, self._split(params))):
            if hasattr(w, "pgradient_pair"):
                re_tree[f"wf{i}"], im_tree[f"wf{i}"] = w.pgradient_pair(
                    p, positions
                )
            else:
                re_tree[f"wf{i}"] = w.pgradient(p, positions)
                im_tree[f"wf{i}"] = jax.tree.map(
                    jnp.zeros_like, re_tree[f"wf{i}"]
                )
        return re_tree, im_tree

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
