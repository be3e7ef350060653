"""Pallas fused GTO kernel vs the XLA path (interpret mode on CPU; the
compiled kernel is exercised on real TPU hardware — measured at parity with
XLA for H2O/Li4-sized bases, see ops/gto_pallas.py docstring)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.ops.gto import GTOSpec, eval_gto
from pyqmc_tpu.ops.gto_pallas import build_pallas_evaluator


@pytest.mark.parametrize("basis,atoms", [
    ("sto-3g", "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867"),
    ("ccecpccpvdz", "Li 0 0 0; Li 3 0 0"),
])
def test_pallas_matches_xla(basis, atoms):
    kwargs = {"ecp": "ccecp", "spin": 0} if basis == "ccecpccpvdz" else {}
    mol = Molecule(atoms, basis=basis, **kwargs)
    spec = GTOSpec.from_molecule(mol)
    f = build_pallas_evaluator(spec, tile=64, interpret=True)
    X = jnp.asarray(np.random.default_rng(0).normal(scale=1.5, size=(128, 3)))
    ao, gr, lp = f(X)
    ao2, gr2, lp2 = eval_gto(spec, X, mode=2)
    np.testing.assert_allclose(ao, ao2, atol=1e-13)
    np.testing.assert_allclose(gr, gr2, atol=1e-13)
    np.testing.assert_allclose(lp, lp2, atol=1e-13)


def test_fused_eval_gto2_padding_and_shapes():
    """fused_eval_gto2 handles arbitrary leading dims + non-tile-multiple
    point counts (pads internally) and matches eval_gto(mode=2)."""
    from pyqmc_tpu.ops.gto_pallas import fused_eval_gto2

    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
        basis="ccecpccpvdz", ecp="ccecp",
    )
    spec = GTOSpec.from_molecule(mol)
    f = fused_eval_gto2(spec, tile=64, interpret=True)
    X = jnp.asarray(
        np.random.default_rng(1).normal(scale=1.5, size=(5, 7, 3))
    )  # 35 points: not a multiple of 64
    ao, gr, lp = f(X)
    ao2, gr2, lp2 = eval_gto(spec, X, mode=2)
    assert ao.shape == (5, 7, spec.nao)
    assert gr.shape == (5, 7, 3, spec.nao)
    np.testing.assert_allclose(ao, ao2, atol=1e-12)
    np.testing.assert_allclose(gr, gr2, atol=1e-12)
    np.testing.assert_allclose(lp, lp2, atol=1e-12)
