"""External selected-CI determinant import (system/ci_import.py; parity with
pyqmc/pyscftools.py:200-298 + determinant_tools.py:8-91)."""

import numpy as np
import jax

from pyqmc_tpu.system.ci_import import (
    binary_to_occ,
    determinants_from_bitstrings,
    expansion_from_determinants,
    interpret_ci,
    _pyscf_strings,
)


def test_binary_to_occ():
    # bin() prints MSB first; orbital 0 is the rightmost bit
    assert binary_to_occ("1", 0) == [0]
    assert binary_to_occ("101", 0) == [0, 2]
    assert binary_to_occ("101", 2) == [0, 1, 2, 4]  # core prepended, shifted


def test_expansion_dedup():
    dets = [
        (0.9, ([0, 1], [0, 1])),
        (0.3, ([0, 2], [0, 1])),
        (-0.2, ([0, 1], [0, 2])),
    ]
    exp, coeff = expansion_from_determinants(dets)
    np.testing.assert_array_equal(exp.occ_up, [[0, 1], [0, 2]])
    np.testing.assert_array_equal(exp.occ_dn, [[0, 1], [0, 2]])
    np.testing.assert_array_equal(exp.map_up, [0, 1, 0])
    np.testing.assert_array_equal(exp.map_dn, [0, 0, 1])
    np.testing.assert_allclose(coeff, [0.9, 0.3, -0.2])


def test_pyscf_string_order():
    # colexicographic = ascending bitmask value, pyscf cistring convention
    strs = _pyscf_strings(4, 2)
    masks = [sum(1 << o for o in s) for s in strs]
    assert masks == sorted(masks)
    assert masks == [3, 5, 6, 9, 10, 12]


class _FakeHCI:
    """Duck-typed pyscf hci.SCI look-alike (ci + _strs + ncore)."""

    def __init__(self):
        self.ncore = 1
        # up strings: 0b0011 (orbs 0,1), 0b0101 (orbs 0,2); dn: 0b0011
        self._strs = np.array([[0b0011, 0b0011], [0b0101, 0b0011]], dtype=np.uint64)
        self.ci = np.array([0.95, -0.31])


def test_interpret_hci_object():
    exp, coeff = interpret_ci(_FakeHCI(), tol=1e-6)
    # ncore=1: core orbital 0 prepended, active orbitals shifted by 1
    np.testing.assert_array_equal(exp.occ_up, [[0, 1, 2], [0, 1, 3]])
    np.testing.assert_array_equal(exp.occ_dn, [[0, 1, 2]])
    np.testing.assert_array_equal(exp.map_up, [0, 1])
    np.testing.assert_array_equal(exp.map_dn, [0, 0])
    np.testing.assert_allclose(coeff, [0.95, -0.31])


class _FakeCASCI:
    def __init__(self):
        self.ncore = 1
        self.ncas = 4
        self.nelecas = (2, 2)
        ci = np.zeros((6, 6))
        ci[0, 0] = 0.9  # up (0,1), dn (0,1)
        ci[3, 0] = -0.2  # colex string 3 = orbs (0,3)
        self.ci = ci


def test_interpret_dense_ci():
    exp, coeff = interpret_ci(_FakeCASCI(), tol=1e-6)
    np.testing.assert_array_equal(exp.occ_up, [[0, 1, 2], [0, 1, 4]])
    np.testing.assert_array_equal(exp.occ_dn, [[0, 1, 2]])
    np.testing.assert_allclose(coeff, [0.9, -0.2])


def test_imported_expansion_runs_vmc():
    """End-to-end: bitstring import -> generate_slater(mc=...) -> VMC."""
    from pyqmc_tpu.system.mole import Molecule
    from pyqmc_tpu.system.scf import run_scf
    from pyqmc_tpu.wftools import generate_slater
    from pyqmc_tpu.configs import initial_guess
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.method.vmc import vmc

    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="sto-3g")
    mf = run_scf(mol)
    dets = determinants_from_bitstrings(
        [(0.99, "01", "01"), (-0.12, "10", "10")], ncore=0
    )
    wf = generate_slater(mol, mf, mc=expansion_from_determinants(dets))
    cfg = initial_guess(mol, 32, key=jax.random.PRNGKey(0))
    data, _ = vmc(
        wf, wf.make_params(), cfg, nblocks=2, nsteps_per_block=4, tstep=0.8,
        accumulators={"energy": EnergyAccumulator(mol)},
        key=jax.random.PRNGKey(1),
    )
    assert np.isfinite(data[-1]["energytotal"])
