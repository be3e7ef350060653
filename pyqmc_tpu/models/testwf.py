"""Wavefunction contract tests (port of pyqmc/wf/testwf.py:20-289).

Any wavefunction implementing the protocol can be swept through these
consistency checks; unit tests apply them to every model. All checks run in
f64 on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def _value(wf, params, state):
    return wf.value(params, state)


def test_updateinternals(wf, params, configs, key, tol=1e-9):
    """Masked single-electron moves + SM updates must match full recompute.

    cf. testwf.py:92-146.
    """
    pos = configs.positions
    nconf, nelec = pos.shape[:2]
    state = wf.recompute(params, pos)
    errors = []
    for e in range(nelec):
        key, k1, k2 = jax.random.split(key, 3)
        newpos = pos[:, e, :] + 0.3 * jax.random.normal(k1, (nconf, 3), dtype=pos.dtype)
        newpos, wrap = configs.make_irreducible(newpos)
        mask = jax.random.uniform(k2, (nconf,)) > 0.5
        ratio, saved = wf.testvalue(params, state, jnp.int32(e), newpos)
        state = wf.updateinternals(params, state, jnp.int32(e), newpos, mask, saved)
        pos = pos.at[:, e, :].set(jnp.where(mask[:, None], newpos, pos[:, e, :]))
        ph_u, la_u = _value(wf, params, state)
        st_ref = wf.recompute(params, pos)
        ph_r, la_r = _value(wf, params, st_ref)
        errors.append(
            (
                float(jnp.max(jnp.abs(la_u - la_r))),
                float(jnp.max(jnp.abs(ph_u - ph_r))),
            )
        )
    err = np.max(np.asarray(errors))
    assert err < tol, f"updateinternals mismatch: {errors}"
    return err


def test_testvalue(wf, params, configs, key, tol=1e-9):
    """testvalue must equal the ratio of recomputed values (testwf.py:44-66)."""
    pos = configs.positions
    nconf, nelec = pos.shape[:2]
    state = wf.recompute(params, pos)
    ph0, la0 = _value(wf, params, state)
    for e in [0, nelec - 1]:
        key, k1 = jax.random.split(key)
        newpos = pos[:, e, :] + 0.4 * jax.random.normal(k1, (nconf, 3), dtype=pos.dtype)
        newpos, _ = configs.make_irreducible(newpos)
        ratio, _ = wf.testvalue(params, state, jnp.int32(e), newpos)
        pos2 = pos.at[:, e, :].set(newpos)
        st2 = wf.recompute(params, pos2)
        ph2, la2 = _value(wf, params, st2)
        ratio_ref = (ph2 / ph0) * jnp.exp(la2 - la0)
        err = float(jnp.max(jnp.abs(ratio - ratio_ref)))
        assert err < tol * float(jnp.max(jnp.abs(ratio_ref)) + 1), (
            f"testvalue mismatch e={e}: {err}"
        )


def test_testvalue_many(wf, params, configs, key, tol=1e-9):
    """Each column of testvalue_many must equal testvalue for that electron
    (testwf.py:66-91)."""
    pos = configs.positions
    nconf, nelec = pos.shape[:2]
    state = wf.recompute(params, pos)
    key, k1 = jax.random.split(key)
    epos = pos[:, 0, :] + 0.5 * jax.random.normal(k1, (nconf, 3), dtype=pos.dtype)
    epos, _ = configs.make_irreducible(epos)
    many = wf.testvalue_many(params, state, epos)
    assert many.shape == (nconf, nelec)
    for e in range(nelec):
        one, _ = wf.testvalue(params, state, jnp.int32(e), epos)
        err = float(jnp.max(jnp.abs(many[:, e] - one)))
        assert err < tol * (1 + float(jnp.max(jnp.abs(one)))), (e, err)


def test_gradient_value_pair(wf, params, configs, key, tol=1e-10):
    """gradient_value_pair must agree with separate gradient/gradient_value
    calls (fused two-position utility path)."""
    pos = configs.positions
    nconf = pos.shape[0]
    state = wf.recompute(params, pos)
    key, k1 = jax.random.split(key)
    e = jnp.int32(0)
    epos_old = pos[:, 0, :]
    epos_new = epos_old + 0.4 * jax.random.normal(k1, (nconf, 3), dtype=pos.dtype)
    go, gn, ratio, _ = wf.gradient_value_pair(params, state, e, epos_old, epos_new)
    go_ref = wf.gradient(params, state, e, epos_old)
    gn_ref, r_ref, _ = wf.gradient_value(params, state, e, epos_new)
    for a, b in ((go, go_ref), (gn, gn_ref), (ratio, r_ref)):
        assert float(jnp.max(jnp.abs(a - b))) < tol * (
            1 + float(jnp.max(jnp.abs(b)))
        )


def test_gradient_current(wf, params, configs, key, tol=1e-6):
    """gradient_current (cached-orbital drift) must match gradient at each
    electron's current position, both from a fresh recompute and after a
    sequence of accepted/rejected updateinternals moves."""
    pos = configs.positions
    nconf, nelec = pos.shape[:2]
    state = wf.recompute(params, pos)

    def check(state, pos, tag):
        for e in range(nelec):
            ei = jnp.int32(e)
            epos = pos[:, e, :]
            gc = wf.gradient_current(params, state, ei, epos)
            gref = wf.gradient(params, state, ei, epos)
            err = float(jnp.max(jnp.abs(gc - gref)))
            assert err < tol * (1 + float(jnp.max(jnp.abs(gref)))), (
                f"gradient_current mismatch {tag} e={e}: {err}"
            )

    check(state, pos, "fresh")
    # move half the walkers for a few electrons through gradient_value +
    # updateinternals (the hot-path cache maintenance)
    for e in range(min(nelec, 3)):
        key, k1 = jax.random.split(key)
        ei = jnp.int32(e)
        newpos = pos[:, e, :] + 0.3 * jax.random.normal(
            k1, (nconf, 3), dtype=pos.dtype
        )
        newpos, _ = configs.make_irreducible(newpos)
        _, _, saved = wf.gradient_value(params, state, ei, newpos)
        mask = jnp.arange(nconf) % 2 == 0
        state = wf.updateinternals(params, state, ei, newpos, mask, saved)
        pos = pos.at[:, e, :].set(
            jnp.where(mask[:, None], newpos, pos[:, e, :])
        )
    check(state, pos, "after updates")


def test_gradient(wf, params, configs, key, delta=1e-5, tol=1e-5):
    """grad log psi vs finite differences (testwf.py:149-185)."""
    pos = configs.positions
    nconf, nelec = pos.shape[:2]
    state = wf.recompute(params, pos)
    maxerr = 0.0
    for e in [0, nelec - 1]:
        epos = pos[:, e, :]
        grad = wf.gradient(params, state, jnp.int32(e), epos)
        for ax in range(3):
            shift = jnp.zeros(3, dtype=pos.dtype).at[ax].set(delta)
            rp, _ = wf.testvalue(params, state, jnp.int32(e), epos + shift)
            rm, _ = wf.testvalue(params, state, jnp.int32(e), epos - shift)
            # d/dx psi/psi = (r+ - r-) / (2 delta) at ratio ~ 1
            fd = (rp - rm) / (2 * delta)
            maxerr = max(maxerr, float(jnp.max(jnp.abs(grad[:, ax] - fd))))
    assert maxerr < tol, f"gradient FD mismatch {maxerr}"
    return maxerr


def test_gradient_laplacian(wf, params, configs, key, delta=1e-4, tol=1e-4):
    """lap psi/psi vs FD of testvalue (testwf.py:221+)."""
    pos = configs.positions
    nconf, nelec = pos.shape[:2]
    state = wf.recompute(params, pos)
    maxerr = 0.0
    for e in [0, nelec - 1]:
        epos = pos[:, e, :]
        grad, lap = wf.gradient_laplacian(params, state, jnp.int32(e), epos)
        gv, ratio, _ = wf.gradient_value(params, state, jnp.int32(e), epos)
        maxerr = max(maxerr, float(jnp.max(jnp.abs(gv - grad))))
        maxerr = max(maxerr, float(jnp.max(jnp.abs(ratio - 1.0))))
        acc = -6.0 * jnp.ones(nconf, dtype=pos.dtype)
        for ax in range(3):
            shift = jnp.zeros(3, dtype=pos.dtype).at[ax].set(delta)
            rp, _ = wf.testvalue(params, state, jnp.int32(e), epos + shift)
            rm, _ = wf.testvalue(params, state, jnp.int32(e), epos - shift)
            acc = acc + rp + rm
        fd_lap = acc / delta**2
        maxerr = max(maxerr, float(jnp.max(jnp.abs(lap - fd_lap))))
    assert maxerr < tol, f"laplacian FD mismatch {maxerr}"
    return maxerr


def test_pgradient(wf, params, configs, key, delta=1e-6, tol=1e-5):
    """pgradient vs finite differences of log|psi| (testwf.py:188+).

    Convention: pgradient returns d log psi / dp holomorphically for complex
    parameters, so d log|psi| along the real direction is Re(g) and along
    the imaginary direction is -Im(g).
    """
    pos = configs.positions
    pgrad = wf.pgradient(params, pos)
    flat_p, unravel = ravel_pytree(params)
    flat_g, _ = ravel_pytree(
        jax.tree.map(lambda g: jnp.sum(g, axis=0), pgrad)
    )

    def total_logabs(fp):
        p = unravel(fp)
        st = wf.recompute(p, pos)
        _, la = _value(wf, p, st)
        return jnp.sum(la)

    # FD on a random subset of parameters; sweep deltas and take the best
    # (the reference does the same, tests/unit/test_wf_derivatives.py:53-61:
    # high curvature near nodes makes any single delta unreliable).
    rng = np.random.default_rng(0)
    idx = rng.choice(flat_p.shape[0], size=min(10, flat_p.shape[0]), replace=False)
    # which flat indices belong to complex leaves (ravel_pytree promotes a
    # mixed tree to complex, so check per-leaf dtypes)
    leaf_complex = np.concatenate(
        [
            np.full(np.size(l), bool(jnp.iscomplexobj(l)))
            for l in jax.tree.leaves(params)
        ]
    ) if flat_p.size else np.zeros(0, dtype=bool)
    maxerr = 0.0
    for i in idx:
        directions = [(1.0, jnp.real)]
        if leaf_complex[i]:
            directions.append((1.0j, lambda g: -jnp.imag(g)))
        for direction, expect in directions:
            g_i = expect(flat_g[i])
            best = np.inf
            for d in (1e-4, 1e-5, 1e-6, 1e-7):
                fd = (
                    total_logabs(flat_p.at[i].add(direction * d))
                    - total_logabs(flat_p.at[i].add(-direction * d))
                ) / (2 * d)
                best = min(best, float(jnp.abs(g_i - fd)))
            maxerr = max(maxerr, best)
    assert maxerr < tol, f"pgradient FD mismatch {maxerr}"
    return maxerr


def run_all(wf, params, configs, key, tols=()):
    test_updateinternals(wf, params, configs, key)
    test_testvalue(wf, params, configs, key)
    if hasattr(wf, "testvalue_many"):
        test_testvalue_many(wf, params, configs, key)
    if hasattr(wf, "gradient_value_pair"):
        test_gradient_value_pair(wf, params, configs, key)
    if hasattr(wf, "gradient_current"):
        test_gradient_current(wf, params, configs, key)
    test_gradient(wf, params, configs, key)
    test_gradient_laplacian(wf, params, configs, key)
    test_pgradient(wf, params, configs, key)
