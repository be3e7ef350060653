"""ECP generation machinery (system/ecp_generate.py): format round-trip,
ccECP form constraints, and a light end-to-end fit for boron."""

import numpy as np
import pytest

from pyqmc_tpu.system.ecp_generate import (
    _assemble_ecp,
    core_counts,
    to_nwchem,
    all_electron_targets,
)
from pyqmc_tpu.system.basis import parse_nwchem_ecp


def test_assemble_form_constraints():
    """The local channel must satisfy the published-table constraints the
    library transcription tests check: n=1 coeff = Zeff, n=3 coeff =
    Zeff * alpha1 (system/basis.py provenance notes)."""
    entry = _assemble_ecp(2, 3.0, 4.5, {0: (2.0, 10.0), 1: (1.5, 5.0)})
    ncore, blocks = entry
    assert ncore == 2
    local = dict((l, p) for l, p in blocks)[-1]
    assert local[1] == [[4.5, 3.0]]        # n=1: (alpha1, Zeff)
    assert local[3] == [[4.5, 3.0 * 4.5]]  # n=3: (alpha1, Zeff*alpha1)
    assert local[2] == []                  # no gamma term
    # nonlocal channels are single r^0 gaussians
    s = dict((l, p) for l, p in blocks)[0]
    assert s[2] == [[2.0, 10.0]]


def test_nwchem_roundtrip():
    entry = _assemble_ecp(10, 6.0, 3.2, {0: (2.2, 14.0), 1: (1.9, 7.5)})
    text = "ECP\n" + to_nwchem("S", entry) + "\nEND"
    parsed = parse_nwchem_ecp(text)["S"]
    ncore, blocks = parsed
    assert ncore == 10
    bd = dict((l, p) for l, p in blocks)
    np.testing.assert_allclose(bd[-1][1], [[3.2, 6.0]])
    np.testing.assert_allclose(bd[-1][3], [[3.2, 19.2]])
    np.testing.assert_allclose(bd[0][2], [[2.2, 14.0]])
    np.testing.assert_allclose(bd[1][2], [[1.9, 7.5]])


def test_core_counts():
    assert core_counts(2) == {0: 1}
    assert core_counts(10) == {0: 2, 1: 1}
    assert core_counts(18) == {0: 3, 1: 2}


@pytest.mark.slow
def test_all_electron_targets_boron():
    """All-electron UHF of B resolves the 2s/2p valence levels with sane
    eigenvalues and a 1s core radius well inside the valence shell.

    Anchors are the ALPHA-channel UHF eigenvalues (the generator's target
    convention — the same convention the pseudo-atom is solved in):
    eps_2s(alpha) ~ -0.544 (deeper than the ROHF -0.495 by the 2p-alpha
    exchange), eps_2p(alpha) ~ -0.310 Ha (matches ROHF)."""
    ae = all_electron_targets("B", ncore=2)
    # targets hold VALENCE levels only ({l: [(eps, <r>), ...]}, innermost
    # first); the outermost l=0/l=1 levels are the 2s/2p
    e2s, r2s = ae["targets"][0][-1]
    e2p, r2p = ae["targets"][1][-1]
    assert abs(e2s - -0.544) < 0.02, ae["targets"]
    assert abs(e2p - -0.310) < 0.02, ae["targets"]
    assert ae["core_radius"] < 0.5 < r2s < r2p
