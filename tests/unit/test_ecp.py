"""ECP quadrature: analytic projector identities + rotation invariance
(cf. reference tests/unit/test_ecp_rotation.py:22)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
from pyqmc_tpu.observables.ecp import (
    ECPAccumulator,
    octahedral_grid,
    legendre,
    random_rotations,
)


def test_quadrature_exactness():
    """Grids must integrate P_l(cos gamma) exactly: sum_q w_q P_l(a.q) = 0
    for 1 <= l <= order, any direction a, and sum w = 1. Orders per grid
    match the reference's menu (eval_ecp.py:278-336)."""
    rng = np.random.default_rng(0)
    for naip, lmax in [(6, 3), (12, 5), (18, 5), (26, 7), (32, 9), (50, 11)]:
        pts, w = octahedral_grid(naip)
        assert pts.shape == (naip, 3)
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
        np.testing.assert_allclose(
            np.linalg.norm(pts, axis=1), 1.0, rtol=1e-12
        )
        for _ in range(5):
            a = rng.normal(size=3)
            a /= np.linalg.norm(a)
            for l in range(1, min(lmax, 6) + 1):
                val = np.sum(w * np.asarray(legendre(l, jnp.asarray(pts @ a))))
                assert abs(val) < 1e-10, (naip, l, val)
        # one degree past the design order must NOT integrate exactly
        # (guards against over-claiming the order)
        if lmax < 6:
            fails = []
            for _ in range(10):
                a = rng.normal(size=3)
                a /= np.linalg.norm(a)
                fails.append(
                    abs(np.sum(w * np.asarray(legendre(lmax + 1, jnp.asarray(pts @ a)))))
                )
            assert max(fails) > 1e-6, (naip, lmax + 1)


def test_legendre_values():
    x = jnp.linspace(-1, 1, 7)
    for l in range(7):
        np.testing.assert_allclose(
            np.asarray(legendre(l, x)),
            np.polynomial.legendre.legval(np.asarray(x), [0] * l + [1]),
            atol=1e-12,
        )


def test_variance_decreases_with_naip(fake_ecp_mol):
    """Randomly-rotated quadrature: the spread of the nonlocal estimate over
    rotations must shrink (or stay flat) as naip grows."""
    mol = fake_ecp_mol
    # a superposition of s and p so the projection depends on direction
    nao = mol.nao
    C = np.zeros((nao, 1))
    C[0, 0] = 0.7
    C[3, 0] = 0.7
    exp = DeterminantExpansion.single(1, 0)
    wf = Slater(mol, None, exp, (C, np.zeros((nao, 0))))
    params = wf.make_params()
    rng = np.random.default_rng(11)
    positions = jnp.asarray(rng.normal(scale=1.0, size=(24, 1, 3)))
    state = wf.recompute(params, positions)
    spreads = []
    for naip in (6, 12, 26, 50):
        acc = ECPAccumulator(mol, naip=naip)
        vals = np.stack([
            np.asarray(acc(wf, params, state, positions,
                           jax.random.PRNGKey(1000 + k)))
            for k in range(16)
        ])
        spreads.append(float(vals.std(axis=0).mean()))
    assert spreads[-1] <= spreads[0] * 1.05 + 1e-12, spreads
    assert spreads[-1] <= spreads[1] * 1.05 + 1e-12, spreads


def test_rotations_are_orthogonal():
    R = np.asarray(random_rotations(jax.random.PRNGKey(0), (100,)))
    eye = np.einsum("cij,ckj->cik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (100, 1, 1)), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


def _one_electron_wf(mol, orbital_col):
    """Slater with one up electron occupying a chosen orbital column."""
    nao = mol.nao
    C = np.zeros((nao, 1))
    C[orbital_col, 0] = 1.0
    exp = DeterminantExpansion.single(1, 0)
    return Slater(mol, None, exp, (C, np.zeros((nao, 0))))


@pytest.fixture(scope="module")
def fake_ecp_mol():
    # one "Li"-like atom with a pure l=1 nonlocal channel of known form
    ecp = {
        "Li": [2, [
            [-1, [[], [], [[1.0, 0.7]], [], [], [], []]],   # local: 0.7 e^{-r^2}
            [1, [[], [], [[0.5, 2.0]], [], [], [], []]],    # v_1 = 2 e^{-r^2/2}
        ]]
    }
    basis = {"Li": [[0, [0.5, 1.0]], [1, [0.4, 1.0]]]}
    return Molecule("Li 0 0 0", basis=basis, ecp=ecp, spin=1)


def test_projector_p_state(fake_ecp_mol):
    """For a pure p_z electron, (2l+1) * projection = 1 => ecp_nl = v_1(r)."""
    mol = fake_ecp_mol
    wf = _one_electron_wf(mol, orbital_col=3)  # p_z AO (s, px, py, pz)
    params = wf.make_params()
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.normal(scale=1.0, size=(30, 1, 3)))
    state = wf.recompute(params, pos)
    acc = ECPAccumulator(mol, naip=6)
    val = acc(wf, params, state, pos, jax.random.PRNGKey(2))
    r = np.linalg.norm(np.asarray(pos)[:, 0, :], axis=-1)
    v_local = 0.7 * np.exp(-1.0 * r**2)
    v1 = 2.0 * np.exp(-0.5 * r**2)
    np.testing.assert_allclose(np.asarray(val), v_local + v1, rtol=1e-10)


def test_projector_s_state(fake_ecp_mol):
    """For a pure s electron the l=1 projector integrates to zero."""
    mol = fake_ecp_mol
    wf = _one_electron_wf(mol, orbital_col=0)
    params = wf.make_params()
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.normal(scale=1.0, size=(30, 1, 3)))
    state = wf.recompute(params, pos)
    acc = ECPAccumulator(mol, naip=6)
    val = acc(wf, params, state, pos, jax.random.PRNGKey(4))
    r = np.linalg.norm(np.asarray(pos)[:, 0, :], axis=-1)
    v_local = 0.7 * np.exp(-1.0 * r**2)
    np.testing.assert_allclose(np.asarray(val), v_local, atol=1e-10)


def test_rotation_invariance(fake_ecp_mol):
    """Different random rotations must give identical results for states the
    grid integrates exactly (test_ecp_rotation.py:22 criterion)."""
    mol = fake_ecp_mol
    wf = _one_electron_wf(mol, orbital_col=2)  # p_y
    params = wf.make_params()
    pos = jnp.asarray(np.random.default_rng(5).normal(size=(10, 1, 3)))
    state = wf.recompute(params, pos)
    acc = ECPAccumulator(mol, naip=6)
    v1 = acc(wf, params, state, pos, jax.random.PRNGKey(10))
    v2 = acc(wf, params, state, pos, jax.random.PRNGKey(20))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-9)


def test_ccecp_li_parses():
    mol = Molecule("Li 0 0 0", basis="ccecpccpvdz", ecp="ccecp", spin=1)
    assert mol.nelec == (1, 0)  # 2 core electrons removed
    assert mol.atom_charges[0] == 1
    acc = ECPAccumulator(mol, naip=12 if False else 6)
    assert acc.active
    # local channel contains the +Zeff/r * e^{-ar^2} counterterm (power 1)
    assert 1 in acc.atoms[0].local.powers


def test_downselection_unbiased():
    """Importance-downselected ECP is an unbiased estimator of the dense sum."""
    import jax.numpy as jnp
    from pyqmc_tpu.system.scf import run_scf
    from pyqmc_tpu.configs import initial_guess

    mol = Molecule(
        "C 0 0 0; C 2.9 0 0; C 0 2.9 0; C 2.9 2.9 0",
        basis="ccecpccpvdz", ecp="ccecp", spin=0,
    )
    mf = run_scf(mol)
    from pyqmc_tpu.models.slater import Slater as _S

    wf = _S.from_mean_field(mf)
    p = wf.make_params()
    cfg = initial_guess(mol, 20, key=jax.random.PRNGKey(0))
    st = wf.recompute(p, cfg.positions)
    dense = ECPAccumulator(mol, naip=6)
    down = ECPAccumulator(mol, naip=6, nselect=8)
    f = jax.jit(lambda k: down(wf, p, st, cfg.positions, k))
    fd = jax.jit(lambda k: dense(wf, p, st, cfg.positions, k))
    keys = [jax.random.PRNGKey(10 + i) for i in range(150)]
    sd = np.stack([np.asarray(f(k)) for k in keys])
    dd = np.stack([np.asarray(fd(k)) for k in keys])
    sem = sd.std(axis=0) / np.sqrt(len(keys))
    z = np.abs(sd.mean(axis=0) - dd.mean(axis=0)) / np.maximum(sem, 1e-12)
    assert z.max() < 4.5, z.max()


def test_downselect_weights_bounded_f32():
    """Regression (round-4 advisor, high): an f32 CDF that undershoots 1
    must not let the last stratum clip onto a p=0 (top-k-zeroed) index and
    pick up an ~1e29 importance weight. Force the worst case: u -> 1 so
    the final target sits beyond any undershooting cumsum, with the
    largest-|T| index (the one the top-k pass zeroes) placed LAST so a
    clipped pick lands exactly on p=0."""
    from pyqmc_tpu.observables.ecp import systematic_downselect

    nconf, nq, nselect = 64, 50, 8
    rng = np.random.default_rng(3)
    # many tiny near-equal entries whose f32 cumsum rounds badly + one
    # dominant entry at the END that top-k removes from the remainder
    T = rng.uniform(1e-6, 2e-6, size=(nconf, nq)).astype(np.float32)
    T[:, -nselect // 2:] = 1.0
    u = jnp.full((nconf, 1), 1.0 - 1e-7, dtype=jnp.float32)
    idx, wts = jax.jit(
        lambda t: systematic_downselect(t, nselect, jax.random.PRNGKey(0), u=u)
    )(jnp.asarray(T))
    wts = np.asarray(wts)
    assert np.all(np.isfinite(wts))
    # stochastic weight is 1/(nstoch p) with p >= min/rest_sum ~ 1/(2 nq);
    # anything above ~1e4 means the p=0 pathology fired
    assert wts.max() < 1e4, wts.max()
    # and the estimator over the selected set still reproduces the dense
    # sum in expectation for uniform ratios: sum_sel w T = sum_all T
    est = np.take_along_axis(np.asarray(T), np.asarray(idx), axis=1) * wts
    np.testing.assert_allclose(
        est.sum(axis=1), np.asarray(T).sum(axis=1), rtol=2e-2
    )


def test_per_atom_naip():
    """The quadrature covers only atoms WITH nonlocal channels (ccECP H is
    purely local; ccECP O has one l=0 projector), sized per atom
    (reference default, eval_ecp.py:239-240: 12 multi-channel / 6 single):
    H2O needs 6 aux points per electron, not 3 x naip, and the energies
    agree with a uniform 12-point grid to quadrature accuracy."""
    import jax
    from pyqmc_tpu.system.mole import Molecule
    from pyqmc_tpu.system.scf import run_scf
    from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
    from pyqmc_tpu.configs import initial_guess

    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
        basis="ccecp-ccpvdz", ecp="ccecp",
    )
    acc_auto = ECPAccumulator(mol)
    assert [len(a.nonlocal_channels) for a in acc_auto.atoms] == [1, 0, 0]
    assert acc_auto.atom_naip == [6]
    assert acc_auto.nq_total == 6
    acc_12 = ECPAccumulator(mol, naip=12)
    assert acc_12.nq_total == 12

    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    params = wf.make_params()
    configs = initial_guess(mol, 32, key=jax.random.PRNGKey(0))
    pos = configs.positions
    state = wf.recompute(params, pos)
    key = jax.random.PRNGKey(1)
    e_auto = np.asarray(acc_auto(wf, params, state, pos, key))
    e_12 = np.asarray(acc_12(wf, params, state, pos, key))
    # same local part; the O l=0 projector differs only by angular
    # quadrature error between the 6- and 12-point grids
    np.testing.assert_allclose(e_auto, e_12, atol=2e-2)
    assert np.max(np.abs(e_auto)) > 1e-3


def test_nselect_auto_rule():
    """Default nselect='auto': dense for small systems (H2O: one 6-point
    atom), capped at 4 atoms' worth of points for many-atom systems (the
    static analog of the reference's default stochastic ECP masking)."""
    h2o = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
        basis="ccecpccpvdz", ecp="ccecp",
    )
    acc = ECPAccumulator(h2o)
    assert acc.nselect is None and acc.nq_total == 6
    atoms = "; ".join(
        f"C {3.0*i} {3.0*j} 0" for i in range(4) for j in range(4)
    )
    c16 = Molecule(atoms, basis="ccecpccpvdz", ecp="ccecp", spin=0)
    acc16 = ECPAccumulator(c16, naip=6)
    assert acc16.nq_total == 96 and acc16.nselect == 24
    dense16 = ECPAccumulator(c16, naip=6, nselect=None)
    assert dense16.nselect is None


def test_downselect_flat_path_matches_per_electron():
    """The flat downselected path (one testvalue_aux_all call over the
    gathered selections) must reproduce the per-electron chunked path
    (_nonlocal_electron) exactly: both consume identical per-electron
    rotation + selection streams, so the sums agree to fp rounding."""
    from pyqmc_tpu.system.scf import run_scf
    from pyqmc_tpu.configs import initial_guess

    mol = Molecule(
        "C 0 0 0; C 2.9 0 0; C 0 2.9 0; C 2.9 2.9 0",
        basis="ccecpccpvdz", ecp="ccecp", spin=0,
    )
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    p = wf.make_params()
    cfg = initial_guess(mol, 12, key=jax.random.PRNGKey(0))
    st = wf.recompute(p, cfg.positions)
    acc = ECPAccumulator(mol, naip=6, nselect=8)
    assert acc.nselect == 8 and acc.nq_total > 8  # downselect active
    key = jax.random.PRNGKey(5)
    total = np.asarray(acc(wf, p, st, cfg.positions, key))
    # reference: the per-electron internals with the same key stream
    dtype = cfg.positions.dtype
    local = jnp.zeros(cfg.positions.shape[0], dtype)
    for aecp in acc.atoms:
        R = jnp.asarray(acc.atom_coords[aecp.atom], dtype)
        d = acc._mic(cfg.positions - R[None, None, :])
        r = jnp.linalg.norm(d, axis=-1)
        local = local + jnp.sum(aecp.local.evaluate(r), axis=1)
    nl = jnp.zeros_like(local)
    for e in range(acc.nelec):
        ekey = jax.random.fold_in(key, 1000 + e)
        re_e, _ = acc._nonlocal_electron(wf, p, st, cfg.positions, e, ekey)
        nl = nl + re_e
    np.testing.assert_allclose(total, np.asarray(local + nl), rtol=1e-10)


def test_periodic_general_lattice_builds():
    """Regression: constructing an ECPAccumulator on a MODE_GENERAL (skewed)
    lattice must evaluate the single-wrap minimal-image gate — the radial
    screening grid spans [inradius, self.rmax] (a NameError here only
    surfaced on periodic builds because the gate is lattice-gated)."""
    from ..fixtures_pbc import load_cell
    from pyqmc_tpu.system.supercell import get_supercell

    cell, _ = load_cell("diamond_primitive")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    acc = ECPAccumulator(sup, naip=6)
    assert isinstance(acc._mic_fast, (bool, np.bool_))
    assert acc.nq_total > 0


def test_flat_chunked_matches_unchunked_periodic():
    """The flat-orbital ECP path with electron CHUNKING must agree exactly
    with the unchunked call: chunks carry arbitrary mixed-spin electron
    subsets, which the static-es testvalue_aux_all contraction handles
    (regression: the lax.scan chunking fed electron subsets into a
    contraction that assumed aux covered all electrons in order, breaking
    every configuration whose echunk < nelec — i.e. the periodic bench)."""
    from ..fixtures_pbc import load_cell
    from pyqmc_tpu.system.supercell import get_supercell
    from pyqmc_tpu.models.orbitals import KPointOrbitals
    from pyqmc_tpu.models.jastrow import JastrowSpin
    from pyqmc_tpu.models.multiply import MultiplyWF
    from pyqmc_tpu.configs import initial_guess
    from pyqmc_tpu.wftools import default_jastrow_basis

    cell, d = load_cell("diamond_primitive")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    kpts = np.asarray(d["kpts"])
    blocks = [np.asarray(d["mo_coeff"][k])[:, :4] for k in range(len(kpts))]
    norb = 4 * len(kpts)
    orb = KPointOrbitals(cell, kpts, (blocks, blocks), img_tol=1e-4)
    slater = Slater(sup, orb, DeterminantExpansion.single(norb, norb))
    a_b, b_b = default_jastrow_basis(sup)
    sj = MultiplyWF(slater, JastrowSpin(sup, a_basis=a_b, b_basis=b_b))
    params = sj.make_params()
    configs = initial_guess(sup, 4, key=jax.random.PRNGKey(3))
    st = sj.recompute(params, configs.positions)
    key = jax.random.PRNGKey(1)
    o1 = np.asarray(
        ECPAccumulator(sup, naip=6, echunk=None)(
            sj, params, st, configs.positions, key
        )
    )
    # echunk=7 forces uneven mixed-spin chunks (7,...,1) on 64 electrons
    o2 = np.asarray(
        ECPAccumulator(sup, naip=6, echunk=7)(
            sj, params, st, configs.positions, key
        )
    )
    np.testing.assert_allclose(o1, o2, rtol=1e-9)


def test_flat_chunked_matches_unchunked_molecular():
    """Same chunking invariance on a molecular multi-atom configuration
    (mixed-spin chunks, dense and downselected)."""
    from pyqmc_tpu.system.scf import run_scf
    from pyqmc_tpu.configs import initial_guess

    mol = Molecule(
        "C 0 0 0; C 2.9 0 0; C 0 2.9 0; C 2.9 2.9 0",
        basis="ccecpccpvdz", ecp="ccecp", spin=0,
    )
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    p = wf.make_params()
    cfg = initial_guess(mol, 5, key=jax.random.PRNGKey(0))
    st = wf.recompute(p, cfg.positions)
    key = jax.random.PRNGKey(5)
    for nselect in (None, 8):
        o1 = np.asarray(
            ECPAccumulator(mol, naip=6, nselect=nselect, echunk=None)(
                wf, p, st, cfg.positions, key
            )
        )
        o2 = np.asarray(
            ECPAccumulator(mol, naip=6, nselect=nselect, echunk=3)(
                wf, p, st, cfg.positions, key
            )
        )
        np.testing.assert_allclose(o1, o2, rtol=1e-9)
