"""Complex-parameter LinearTransform + SR pieces.

Parity: the reference splits complex parameters into re/im directions
(/root/reference/pyqmc/observables/accumulators.py:122-185) and regularizes
parameter gradients near nodes
(/root/reference/pyqmc/observables/stochastic_reconfiguration.py:21-45).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pyqmc_tpu.observables.transform import LinearTransform
from pyqmc_tpu.observables.sr import nodal_regularization


def _params():
    return {
        "a": jnp.array([1.0, 2.0, 3.0]),
        "c": jnp.array([1.0 + 2.0j, -0.5 + 0.25j]),
    }


def test_complex_roundtrip():
    params = _params()
    lt = LinearTransform(params)
    flat = lt.serialize(params)
    # [re(a), re(c), im(c)]
    assert flat.shape == (7,)
    assert lt.nparams == 7 and lt.nimag == 2
    np.testing.assert_allclose(np.asarray(flat), [1, 2, 3, 1, -0.5, 2, 0.25])
    # perturb and round-trip
    flat2 = flat + jnp.arange(7, dtype=flat.dtype) * 0.1
    p2 = lt.deserialize(params, flat2)
    np.testing.assert_allclose(np.asarray(p2["a"]), [1.0, 2.1, 3.2])
    np.testing.assert_allclose(
        np.asarray(p2["c"]), [1.3 + 2.5j, -0.1 + 0.85j], atol=1e-12
    )


def test_complex_roundtrip_masked():
    params = _params()
    to_opt = {"a": np.array([True, False, True]), "c": np.array([False, True])}
    lt = LinearTransform(params, to_opt)
    assert lt.nparams == 4 and lt.nimag == 1  # 3 real slots + 1 imag slot
    flat = lt.serialize(params)
    np.testing.assert_allclose(np.asarray(flat), [1, 3, -0.5, 0.25])
    p2 = lt.deserialize(params, flat.at[2].add(1.0).at[3].add(-0.25))
    np.testing.assert_allclose(np.asarray(p2["c"]), [1 + 2j, 0.5 + 0.0j])
    # frozen entries untouched
    np.testing.assert_allclose(np.asarray(p2["a"]), [1.0, 2.0, 3.0])


def test_gradient_pair_directions():
    """R/I slots must be the real/imag parts of dlnPsi along each real
    direction: a-slot (Re O, Im O), b-slot (-Im O, Re O)."""
    params = _params()
    lt = LinearTransform(params)
    O_a = jnp.array([[0.5, -1.0, 2.0]])  # real-leaf gradients (real)
    O_c = jnp.array([[1.0 + 3.0j, -2.0 - 0.5j]])  # holomorphic dlnPsi/dc
    R, I = lt.serialize_gradients_pair({"a": O_a, "c": O_c})
    assert R.shape == (1, 7) and I.shape == (1, 7)
    np.testing.assert_allclose(np.asarray(R[0]), [0.5, -1, 2, 1, -2, -3, 0.5])
    np.testing.assert_allclose(np.asarray(I[0]), [0, 0, 0, 3, -0.5, 1, -2])


def test_real_only_fast_path():
    params = {"a": jnp.array([1.0, 2.0])}
    lt = LinearTransform(params)
    R, I = lt.serialize_gradients_pair({"a": jnp.array([[3.0, 4.0]])})
    assert I is None
    np.testing.assert_allclose(np.asarray(R), [[3.0, 4.0]])
    # serialize_batch still works for the real case
    np.testing.assert_allclose(
        np.asarray(lt.serialize_batch({"a": jnp.array([[3.0, 4.0]])})),
        [[3.0, 4.0]],
    )


def test_nodal_regularization_polynomial():
    cutoff = 1e-3
    # far from a node (grad2 small enough that r = 1/grad2 > cutoff^2): f = 1
    f_far = nodal_regularization(jnp.array([1.0, 100.0]), cutoff)
    np.testing.assert_allclose(np.asarray(f_far), [1.0, 1.0])
    # at the boundary r = cutoff^2: polynomial hits exactly 1 (continuity)
    f_b = nodal_regularization(jnp.array([1.0 / cutoff**2]), cutoff)
    np.testing.assert_allclose(np.asarray(f_b), [1.0], rtol=1e-6)
    # approaching the node: f -> 0 like 9 r / c^2
    g2 = 1e12  # r = 1e-12
    f_n = nodal_regularization(jnp.array([g2]), cutoff)
    np.testing.assert_allclose(np.asarray(f_n), [9e-12 / cutoff**2], rtol=1e-5)
    # reference polynomial values at interior points (stochastic_reconfiguration.py:36-43)
    for x in (0.1, 0.5, 0.9):
        r = x * cutoff**2
        expect = 9 * x - 15 * x**2 + 7 * x**3
        got = float(nodal_regularization(jnp.array([1.0 / r]), cutoff)[0])
        np.testing.assert_allclose(got, expect, rtol=1e-6)
