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


def test_fused_replicated_pbc_path():
    """The replicated-shell PBC evaluator produces identical k-AOs through
    the fused kernel (interpret mode) and the XLA path."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from fixtures_pbc import load_cell
    from pyqmc_tpu.models.orbitals import KPointOrbitals
    from pyqmc_tpu.ops.gto_pallas import fused_eval_gto2

    cell, d = load_cell("diamond_primitive")
    kpts = np.asarray(d["kpts"])
    blocks = [np.asarray(d["mo_coeff"][k])[:, :4] for k in range(len(kpts))]
    orb = KPointOrbitals(cell, kpts, (blocks, blocks), img_tol=1e-4)
    assert orb.real_mode and orb._repl is not None
    X = jnp.asarray(
        np.random.default_rng(3).normal(scale=2.0, size=(24, 3)), jnp.float32
    )
    ref = orb._kaos_replicated(X, 2)
    orb._repl_fused2 = fused_eval_gto2(orb._repl_spec, tile=64, interpret=True)
    out = orb._kaos_replicated(X, 2)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_fused_value_mo_matches_xla():
    """fused_value_mo (interpret mode): fused GTO value + MO contraction
    equals eval_gto(mode=0) @ C for a permuted-coefficient input."""
    from pyqmc_tpu.ops.gto_pallas import fused_value_mo

    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
        basis="ccecpccpvdz", ecp="ccecp",
    )
    spec = GTOSpec.from_molecule(mol)
    rng = np.random.default_rng(7)
    C = jnp.asarray(rng.normal(size=(spec.nao, 9)))
    concat_rows = np.argsort(spec.perm)
    f = fused_value_mo(spec, 9, tile=64, interpret=True)
    X = jnp.asarray(rng.normal(scale=1.5, size=(5, 23, 3)))  # non-multiple
    mo = f(X, C[concat_rows])
    ref = eval_gto(spec, X, mode=0) @ C
    assert mo.shape == (5, 23, 9)
    np.testing.assert_allclose(mo, ref, atol=1e-12)


def test_folded_coeff_eval_matches_kao_route():
    """The folded-coefficient real-mode evaluation (one AO_repl @ R
    contraction + wrap-phase column fixup) is numerically identical to the
    k-AO route (phase matmul + per-k MO blocks) on every derivative slot,
    and eval_mo_t returns its transpose."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from fixtures_pbc import load_cell
    from pyqmc_tpu.models.orbitals import KPointOrbitals

    cell, d = load_cell("diamond_primitive")
    kpts = np.asarray(d["kpts"])
    blocks = [np.asarray(d["mo_coeff"][k])[:, :4] for k in range(len(kpts))]
    orb = KPointOrbitals(cell, kpts, (blocks, blocks), img_tol=1e-4)
    assert orb.real_mode and orb._repl is not None
    params = orb.make_params()
    # points spread over several cells so wrap phases exercise both signs
    X = jnp.asarray(np.random.default_rng(11).normal(scale=4.0, size=(37, 3)))

    def kao_route(mode):
        kaos = orb._kaos(X, mode)
        out = []
        for arr in kaos:
            out.append(orb._mos_from_kaos(params, arr, 0))
            out.append(orb._mos_from_kaos(params, arr, 1))
        return tuple(out)

    for mode in (0, 1, 2):
        got = orb._eval_folded(params, X, mode)
        ref = kao_route(mode)
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-10
            )
    # eval dispatches to the folded path in real mode
    for a, b in zip(orb.eval(params, X, 2), kao_route(2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    # transposed single-det ECP layout
    mo_t = orb.eval_mo_t(params, X)
    mu, md = orb.eval(params, X, 0)
    np.testing.assert_allclose(
        np.asarray(mo_t), np.asarray(jnp.concatenate([mu, md], axis=-1).T),
        atol=1e-10,
    )
