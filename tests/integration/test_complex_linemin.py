"""Optimize a wavefunction with complex orbital coefficients.

Parity with /root/reference/tests/integration/test_complex_linemin.py:22-47:
H2 (ccECP) with mo_coeff rotated into the complex plane plus noise; SR line
minimization over orbital + Jastrow parameters must lower the energy. The
complex parameters are optimized through the re/im split in LinearTransform
and the complex-channel SR gradient (observables/sr.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
from pyqmc_tpu.models.jastrow import JastrowSpin
from pyqmc_tpu.models.multiply import MultiplyWF
from pyqmc_tpu.observables.accumulators import EnergyAccumulator
from pyqmc_tpu.observables.transform import LinearTransform
from pyqmc_tpu.method.linemin import line_minimization
from pyqmc_tpu.configs import initial_guess


@pytest.mark.slow
def test_complex_linemin():
    mol = Molecule("H 0 0 0; H 0 0 1.4", basis="ccecp-ccpvdz", ecp="ccecp")
    mf = run_scf(mol)
    rng = np.random.default_rng(7)
    nup, ndn = mol.nelec
    ca = np.asarray(mf.mo_coeff[0][:, :nup])
    cb = np.asarray(mf.mo_coeff[1][:, :ndn])
    noise = lambda s: (rng.random(s) - 0.5) * 0.2
    ca = ca * 1j + noise(ca.shape)
    cb = cb * 1j + noise(cb.shape)
    slater = Slater(
        mol, None, DeterminantExpansion.single(nup, ndn),
        mo_coeff=(jnp.asarray(ca), jnp.asarray(cb)),
    )
    wf = MultiplyWF(slater, JastrowSpin(mol))
    params = wf.make_params()
    to_opt = {
        "wf0": {
            "det_coeff": False,
            "mo_coeff_alpha": np.ones(ca.shape, dtype=bool),
            "mo_coeff_beta": np.ones(cb.shape, dtype=bool),
        },
        "wf1": {"acoeff": True, "bcoeff": True},
    }
    lt = LinearTransform(params, to_opt)
    assert lt.nimag > 0  # the complex channel must actually be exercised

    configs = initial_guess(mol, 512, key=jax.random.PRNGKey(0))
    energy = EnergyAccumulator(mol)
    params2, configs, records = line_minimization(
        wf, params, configs, lt, energy, key=jax.random.PRNGKey(1),
        max_iterations=6, vmc_blocks=8, vmc_steps_per_block=10,
    )
    energies = [r["energy"] for r in records]
    errs = [r["energy_err"] for r in records]
    # the noisy complex start is far from optimal: demand a significant drop
    assert energies[-1] < energies[0] - 3 * (errs[0] + errs[-1]), energies
    # optimized parameters remain complex and finite
    leaves = jax.tree.leaves(params2)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert jnp.iscomplexobj(params2["wf0"]["mo_coeff_alpha"])
