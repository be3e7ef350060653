"""OBDM / TBDM / S^2 / Sq / reblock checks with analytic expectations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.observables.obdm import OBDMAccumulator
from pyqmc_tpu.observables.tbdm import TBDMAccumulator
from pyqmc_tpu.observables.s2 import S2Accumulator
from pyqmc_tpu.observables.sq import SqAccumulator
from pyqmc_tpu.method.vmc import vmc
from pyqmc_tpu.configs import initial_guess
from pyqmc_tpu import reblock as rb


@pytest.fixture(scope="module")
def he_setup():
    # uncontracted 3s basis so there are virtual orbitals to test against
    mol = Molecule(
        "He 0 0 0",
        basis={"He": [[0, [6.0, 1.0]], [0, [1.2, 1.0]], [0, [0.3, 1.0]]]},
    )
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    return mol, mf, wf


def test_obdm_he_occupied(he_setup):
    """For a Slater determinant the OBDM in the occupied-MO basis is the
    identity (occupation 1 per spin-orbital summed to 2 for RHF He)."""
    mol, mf, wf = he_setup
    nocc = mol.nelec[0]
    acc = OBDMAccumulator(mol, mf.mo_coeff[0][:, : nocc + 1])
    configs = initial_guess(mol, 2000, key=jax.random.PRNGKey(0))
    data, _ = vmc(
        wf, wf.make_params(), configs, nblocks=25, nsteps_per_block=10,
        accumulators={"obdm": acc}, key=jax.random.PRNGKey(1),
    )
    rho = np.mean([d["obdmvalue"] for d in data[5:]], axis=0)
    # occupied diagonal = 2 (both spins), virtual diagonal = 0
    assert abs(rho[0, 0] - 2.0) < 0.15, rho
    assert abs(rho[1, 1]) < 0.1, rho
    assert abs(rho[0, 1]) < 0.1 and abs(rho[1, 0]) < 0.1


def test_s2_singlet(he_setup):
    """RHF He is a singlet: <S^2> = 0."""
    mol, mf, wf = he_setup
    acc = S2Accumulator(mol)
    configs = initial_guess(mol, 1500, key=jax.random.PRNGKey(2))
    data, _ = vmc(
        wf, wf.make_params(), configs, nblocks=20, nsteps_per_block=10,
        accumulators={"s2": acc}, key=jax.random.PRNGKey(3),
    )
    s2 = np.mean([d["s2S2"] for d in data[5:]])
    assert abs(s2) < 0.05, s2


def test_s2_triplet():
    """UHF O atom triplet: <S^2> ~ 2 (+small contamination)."""
    mol = Molecule("O 0 0 0", basis="sto-3g", spin=2)
    mf = run_scf(mol)
    wf = Slater.from_mean_field(mf)
    acc = S2Accumulator(mol)
    configs = initial_guess(mol, 800, key=jax.random.PRNGKey(4))
    data, _ = vmc(
        wf, wf.make_params(), configs, nblocks=15, nsteps_per_block=10,
        accumulators={"s2": acc}, key=jax.random.PRNGKey(5),
    )
    s2 = np.mean([d["s2S2"] for d in data[5:]])
    assert abs(s2 - 2.0) < 0.2, s2


def test_tbdm_smoke(he_setup):
    """up-dn TBDM of RHF He: rho2_{0000} ~ 1 (both electrons in MO 0)."""
    mol, mf, wf = he_setup
    acc = TBDMAccumulator(mol, mf.mo_coeff[0][:, :1], spin=(0, 1))
    configs = initial_guess(mol, 2000, key=jax.random.PRNGKey(6))
    data, _ = vmc(
        wf, wf.make_params(), configs, nblocks=20, nsteps_per_block=10,
        accumulators={"tbdm": acc}, key=jax.random.PRNGKey(7),
    )
    val = np.mean([d["tbdmvalue"] for d in data[5:]], axis=0)
    assert abs(val[0, 0, 0, 0] - 1.0) < 0.2, val


def test_sq_limits():
    """Ideal-gas-like check: for uncorrelated positions S(q) -> 1 at large q."""
    qs = np.array([[20.0, 0, 0], [0, 25.0, 0]])
    acc = SqAccumulator(qlist=qs)
    rng = np.random.default_rng(8)
    pos = jnp.asarray(rng.uniform(0, 10, size=(4000, 6, 3)))
    out = acc(None, None, None, pos)
    sq = np.mean(np.asarray(out["Sq"]), axis=0)
    np.testing.assert_allclose(sq, 1.0, atol=0.1)


def test_reblock_iid():
    rng = np.random.default_rng(9)
    x = rng.normal(size=4096)
    mean, se, lvl = rb.opt_block(x)
    np.testing.assert_allclose(se, 1.0 / np.sqrt(4096), rtol=0.3)
    s = rb.reblock_summary(x, 16)
    np.testing.assert_allclose(s["mean"], x.mean(), atol=1e-12)


def test_reblock_correlated():
    """AR(1) series: naive SEM underestimates; reblocked SEM ~ true."""
    rng = np.random.default_rng(10)
    n, rho = 2**14, 0.95
    eps = rng.normal(size=n)
    x = np.empty(n)
    x[0] = eps[0]
    for i in range(1, n):
        x[i] = rho * x[i - 1] + np.sqrt(1 - rho**2) * eps[i]
    true_se = np.sqrt((1 + rho) / (1 - rho) / n)
    naive = x.std(ddof=1) / np.sqrt(n)
    mean, se, lvl = rb.opt_block(x)
    assert naive < 0.5 * true_se
    assert 0.5 * true_se < se < 1.6 * true_se, (se, true_se)


def test_reblock_weighted():
    """Weighted reblock: chunk means are sum(w x)/sum(w), the grand mean is
    the weight-recombined one, and weights=None reproduces the old path
    (reference reblock(df, nblocks, weights), pyqmc/reblock.py:19-129)."""
    rng = np.random.default_rng(11)
    n, nb = 64, 8
    x = rng.normal(size=n)
    w = rng.uniform(0.2, 3.0, size=n)
    b = rb.reblock(x, nb, weights=w)
    xc = x.reshape(nb, -1)
    wc = w.reshape(nb, -1)
    np.testing.assert_allclose(
        b, (xc * wc).sum(axis=1) / wc.sum(axis=1), rtol=1e-12
    )
    s = rb.reblock_summary(x, nb, weights=w)
    np.testing.assert_allclose(
        s["mean"], (x * w).sum() / w.sum(), rtol=1e-12
    )
    np.testing.assert_allclose(
        rb.reblock(x, nb, weights=np.ones(n)), rb.reblock(x, nb), rtol=1e-12
    )
    # array-valued data broadcasts the weights over trailing axes
    xa = rng.normal(size=(n, 3))
    ba = rb.reblock(xa, nb, weights=w)
    for j in range(3):
        np.testing.assert_allclose(
            ba[:, j], rb.reblock(xa[:, j], nb, weights=w), rtol=1e-12
        )


def test_read_mc_output_weighted(tmp_path):
    """read_mc_output weights DMC-style block data by the 'weight' stream:
    a value series correlated with the weights shifts toward the
    high-weight values; weights=None recovers the plain average."""
    import h5py
    from pyqmc_tpu.recipes import read_mc_output

    rng = np.random.default_rng(12)
    nb = 40
    w = rng.uniform(0.5, 2.0, size=nb)
    e = -10.0 + (w - w.mean())  # correlated with weight
    fn = str(tmp_path / "dmc.hdf5")
    with h5py.File(fn, "w") as f:
        f["energytotal"] = e
        f["weight"] = w
    out_w = read_mc_output(fn, warmup=0, reblocks=8)
    out_u = read_mc_output(fn, warmup=0, reblocks=8, weights=None)
    expect_w = (e * w).sum() / w.sum()
    np.testing.assert_allclose(out_w["energytotal"], expect_w, rtol=1e-10)
    np.testing.assert_allclose(out_u["energytotal"], e.mean(), rtol=1e-10)
    assert abs(out_w["energytotal"] - out_u["energytotal"]) > 1e-3
    # the weight stream itself is summarized unweighted
    np.testing.assert_allclose(out_w["weight"], w.reshape(8, -1).mean(axis=1).mean())


def test_tbdm_ijkl_subset(he_setup):
    """The ijkl-selected TBDM entries equal the corresponding entries of
    the full tensor (same RNG key -> same aux points)."""
    mol, mf, wf = he_setup
    coeff = mf.mo_coeff[0][:, :2]
    params = wf.make_params()
    configs = initial_guess(mol, 50, key=jax.random.PRNGKey(16))
    pos = configs.positions
    state = wf.recompute(params, pos)
    key = jax.random.PRNGKey(17)
    full = TBDMAccumulator(mol, coeff, spin=(0, 1))
    ijkl = np.array([[0, 0, 0, 0], [0, 1, 0, 1], [1, 0, 1, 0], [1, 1, 0, 0]])
    sub = TBDMAccumulator(mol, coeff, spin=(0, 1), ijkl=ijkl)
    vf = np.asarray(full(wf, params, state, pos, key)["value"])
    vs = np.asarray(sub(wf, params, state, pos, key)["value"])
    for s, (i, j, k, l) in enumerate(ijkl):
        np.testing.assert_allclose(vs[:, s], vf[:, i, j, k, l],
                                   rtol=1e-6, atol=1e-10)


def test_spin_sq_limits():
    """Uncorrelated positions: both S(q) and S_spin(q) -> 1 at large q;
    at q -> 0, S(q) -> N (coherent) while S_spin(q) -> 0 for equal spin
    populations."""
    from pyqmc_tpu.observables.sq import SqAccumulator

    class _FakeCell:
        nelec = (3, 3)

    qs = np.array([[20.0, 0, 0], [1e-8, 0, 0]])
    acc = SqAccumulator.__new__(SqAccumulator)
    acc.qlist = qs
    acc.nup = 3
    rng = np.random.default_rng(9)
    pos = jnp.asarray(rng.uniform(0, 10, size=(4000, 6, 3)))
    out = acc(None, None, None, pos)
    sq = np.mean(np.asarray(out["Sq"]), axis=0)
    ssq = np.mean(np.asarray(out["spinSq"]), axis=0)
    np.testing.assert_allclose(sq[0], 1.0, atol=0.1)
    np.testing.assert_allclose(ssq[0], 1.0, atol=0.1)
    np.testing.assert_allclose(sq[1], 6.0, atol=1e-6)   # N at q=0
    np.testing.assert_allclose(ssq[1], 0.0, atol=1e-6)  # spin-balanced


def test_read_mc_output_array_observables(tmp_path, he_setup):
    """read_mc_output summarizes ARRAY-valued block series (S(q), density
    matrices) elementwise, not only scalars."""
    from pyqmc_tpu.observables.sq import SqAccumulator
    from pyqmc_tpu.recipes import read_mc_output

    mol, mf, wf = he_setup
    qs = np.array([[1.0, 0, 0], [0, 2.0, 0], [0, 0, 3.0]])
    acc = SqAccumulator(qlist=qs)
    acc.nup = 1
    configs = initial_guess(mol, 100, key=jax.random.PRNGKey(30))
    fn = str(tmp_path / "sq.hdf5")
    vmc(wf, wf.make_params(), configs, nblocks=8, nsteps_per_block=4,
        accumulators={"sq": acc}, key=jax.random.PRNGKey(31), hdf_file=fn)
    out = read_mc_output(fn, warmup=2, reblocks=3)
    assert out["sqSq"].shape == (3,)
    assert out["sqSq_err"].shape == (3,)
    assert np.all(np.isfinite(out["sqSq"]))
    assert "energytotal" not in out or np.isfinite(out.get("energytotal", 0.0))


def test_gradient_generator_factory(he_setup):
    """api.gradient_generator wires EnergyAccumulator + LinearTransform into
    a ready SR accumulator (reference accumulators.py:27-42)."""
    from pyqmc_tpu.api import gradient_generator

    mol, mf, wf = he_setup
    params = wf.make_params()
    to_opt = {k: (k == "det_coeff") for k in params}
    sr = gradient_generator(mol, wf, params, to_opt)
    configs = initial_guess(mol, 32, key=jax.random.PRNGKey(40))
    state = wf.recompute(params, configs.positions)
    out = sr.avg(wf, params, state, configs.positions,
                 key=jax.random.PRNGKey(41))
    nparam = sr.transform.serialize(params).shape[0]
    assert out["dp"].shape == (nparam,)
    assert out["dpidpj"].shape == (nparam, nparam)
    assert np.isfinite(float(out["total"]))
