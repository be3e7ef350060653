"""pyscf_adapter exercised WITHOUT pyscf via duck-typed fakes.

The adapter reads only plain attributes, so fake Mole/Cell/SCF objects
carrying the same surface exercise every conversion branch (RHF, ROHF via
the occupation clip, UHF, Cell, KRHF, CASCI); when real pyscf is installed
the same assertions run against it (skipif below). Reference role:
pyqmc/pyscftools.py:30-102 recover_pyscf.
"""

import numpy as np
import jax
import pytest

from pyqmc_tpu.system.mole import Molecule, Cell
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.system import pyscf_adapter as pa
from pyqmc_tpu.models.slater import Slater
from pyqmc_tpu.configs import initial_guess

# STO-3G hydrogen in pyscf nested-list format (same digits as the builtin
# table, so native-built and adapter-built molecules match bitwise)
_H_STO3G = [[0, [3.42525091, 0.15432897],
             [0.62391373, 0.53532814],
             [0.1688554, 0.44463454]]]


class FakeMole:
    """Duck-typed pyscf Mole: attributes only."""

    def __init__(self, atoms, basis, spin=0, charge=0, ecp=None):
        self._atoms = atoms
        self._basis = basis
        self._ecp = ecp or {}
        self.spin = spin
        self.charge = charge
        self.natm = len(atoms)
        self.a = None

    def atom_symbol(self, i):
        return self._atoms[i][0]

    def atom_coord(self, i):
        return np.asarray(self._atoms[i][1], dtype=float)


class FakeCell(FakeMole):
    def __init__(self, atoms, basis, lattice, **kw):
        super().__init__(atoms, basis, **kw)
        self.a = np.asarray(lattice)

    def lattice_vectors(self):
        return np.asarray(self.a, dtype=float)


class FakeSCF:
    def __init__(self, mol, mo_coeff, mo_energy, mo_occ, e_tot):
        self.mol = mol
        self.mo_coeff = mo_coeff
        self.mo_energy = mo_energy
        self.mo_occ = mo_occ
        self.e_tot = e_tot


def _native_h2():
    mol = Molecule(
        "H 0 0 0; H 0 0 1.4", basis={"H": _H_STO3G}
    )
    return mol, run_scf(mol)


def test_rhf_roundtrip_matches_native():
    """Adapter-built Molecule/MeanField reproduce the native system exactly:
    same SCF energy, and the Slater built from each gives identical local
    energies on shared walkers (the 'VMC energy matches' criterion without
    the sampling noise)."""
    mol, mf = _native_h2()
    atoms = [("H", mol.atom_coords[0]), ("H", mol.atom_coords[1])]
    # pyscf RHF surface: 2-D mo_coeff, occupations in {0, 2}
    occ = np.zeros(mf.mo_coeff[0].shape[1])
    occ[: mol.nelec[0]] = 2.0
    fake = FakeSCF(
        FakeMole(atoms, {"H": _H_STO3G}),
        np.asarray(mf.mo_coeff[0]),
        np.asarray(mf.mo_energy[0]),
        occ,
        mf.e_tot,
    )
    mol2, mf2 = pa.from_pyscf_mf(fake)
    assert mf2.restricted
    assert mf2.e_tot == pytest.approx(mf.e_tot, abs=1e-12)
    assert mol2.nelec == mol.nelec
    np.testing.assert_allclose(mol2.atom_coords, mol.atom_coords)

    from pyqmc_tpu.observables.accumulators import EnergyAccumulator

    configs = initial_guess(mol, 8, key=jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    es = []
    for m, f in ((mol, mf), (mol2, mf2)):
        wf = Slater.from_mean_field(f)
        params = wf.make_params()
        state = wf.recompute(params, configs.positions)
        acc = EnergyAccumulator(m)
        es.append(np.asarray(acc(wf, params, state, configs.positions,
                                 key=key)["total"]))
    np.testing.assert_allclose(es[0], es[1], rtol=1e-10)


def test_rohf_occupation_clip():
    """ROHF surface: 2-D mo_coeff with a singly-occupied level — the clip
    rule must put it in the up channel only (pyscftools.py:206-219)."""
    nao = 4
    rng = np.random.default_rng(3)
    mo = rng.normal(size=(nao, nao))
    occ = np.array([2.0, 1.0, 0.0, 0.0])
    fake = FakeSCF(
        FakeMole([("Li", (0.0, 0.0, 0.0))], {"Li": _H_STO3G}, spin=1),
        mo, np.arange(nao, dtype=float), occ, -7.3,
    )
    mol2, mf2 = pa.from_pyscf_mf(fake)
    assert mf2.restricted
    np.testing.assert_array_equal(mf2.mo_occ[0], [1, 1, 0, 0])
    np.testing.assert_array_equal(mf2.mo_occ[1], [1, 0, 0, 0])
    assert mol2.nelec == (2, 1)


def test_uhf_channels_preserved():
    nao = 3
    rng = np.random.default_rng(4)
    mo = np.stack([rng.normal(size=(nao, nao)) for _ in range(2)])
    occ = (np.array([1.0, 1.0, 0.0]), np.array([1.0, 0.0, 0.0]))
    fake = FakeSCF(
        FakeMole([("Li", (0.0, 0.0, 0.0))], {"Li": _H_STO3G}, spin=1),
        mo, (np.arange(3.0), np.arange(3.0)), occ, -7.4,
    )
    _, mf2 = pa.from_pyscf_mf(fake)
    assert not mf2.restricted
    np.testing.assert_allclose(mf2.mo_coeff[0], mo[0])
    np.testing.assert_allclose(mf2.mo_coeff[1], mo[1])


def test_cell_roundtrip():
    lat = 4.0 * np.eye(3)
    fake = FakeCell(
        [("H", (0.0, 0.0, 0.0)), ("H", (2.0, 0.0, 0.0))],
        {"H": _H_STO3G}, lat,
    )
    cell = pa.from_pyscf_mol(fake)
    assert isinstance(cell, Cell)
    np.testing.assert_allclose(cell.lattice, lat)


def test_kmf_builds_kpoint_orbitals():
    lat = 6.0 * np.eye(3)
    fake_cell = FakeCell(
        [("H", (0.0, 0.0, 0.0)), ("H", (3.0, 0.0, 0.0))],
        {"H": _H_STO3G}, lat,
    )
    nao = 2

    class FakeKMF:
        cell = fake_cell
        kpts = np.zeros((1, 3))
        mo_coeff = [np.eye(nao)]  # gamma only, restricted
        mo_occ = [np.array([2.0, 0.0])]

    cell, orb = pa.from_pyscf_kmf(FakeKMF())
    assert isinstance(cell, Cell)
    assert orb.norb == (1, 1)  # one doubly-occupied orbital -> 1 up, 1 dn
    X = np.array([[0.1, 0.2, 0.3]])
    mo_up, _ = orb.eval(orb.make_params(), X, 0)
    assert np.all(np.isfinite(np.asarray(mo_up)))


def test_casci_expansion():
    """Dense-CI fake (pyscf CASCI surface) -> multi-det Slater expansion."""
    mol, mf = _native_h2()
    atoms = [("H", mol.atom_coords[0]), ("H", mol.atom_coords[1])]
    occ = np.array([2.0, 0.0])
    fake_scf = FakeSCF(
        FakeMole(atoms, {"H": _H_STO3G}),
        np.asarray(mf.mo_coeff[0]), np.asarray(mf.mo_energy[0]), occ, mf.e_tot,
    )

    class FakeCASCI:
        _scf = fake_scf
        ncas = 2
        ncore = 0
        nelecas = (1, 1)
        mo_coeff = np.asarray(mf.mo_coeff[0])
        # CAS(2e,2o) ground state dominated by |00>, some |11>
        ci = np.array([[0.98, 0.0], [0.0, -0.199]])

    mol2, mf2, expansion, det_coeff = pa.from_pyscf_mc(FakeCASCI(), tol=1e-3)
    assert len(det_coeff) == 2
    assert expansion.map_up.shape == (2,)
    wf = Slater(mol2, None, expansion,
                (mf2.mo_coeff[0], mf2.mo_coeff[1]), det_coeff=det_coeff)
    params = wf.make_params()
    configs = initial_guess(mol2, 4, key=jax.random.PRNGKey(5))
    state = wf.recompute(params, configs.positions)
    phase, logv = wf.value(params, state)
    assert np.all(np.isfinite(np.asarray(logv)))


def test_missing_attributes_named_error():
    with pytest.raises(TypeError, match="_basis"):
        pa.from_pyscf_mol(object())
    with pytest.raises(TypeError, match="mo_coeff"):
        pa.from_pyscf_mf(object())


# --- real pyscf (runs only where pyscf is installed) ----------------------
def _has_pyscf():
    try:
        import pyscf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pyscf(), reason="pyscf not installed")
def test_real_pyscf_rhf():
    import pyscf

    pmol = pyscf.gto.M(atom="H 0 0 0; H 0 0 1.4", basis="sto-3g", unit="bohr")
    pmf = pmol.RHF().run()
    mol2, mf2 = pa.from_pyscf_mf(pmf)
    assert mf2.restricted
    assert mf2.e_tot == pytest.approx(float(pmf.e_tot))
