"""Periodic diamond-C benchmark (counterpart of the reference's
benchmarks/c_solid_benchmark.py:10-45): k-point Slater + Jastrow kernel
timings on the primitive diamond cell with ccECP.

Uses the extracted reference SCF fixture for MO coefficients
(tests/files/diamond_primitive.npz).

Run: python benchmarks/c_solid_benchmark.py [nconfig]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]
    return out


def timeit(name, fn, *args, nrep=3):
    out = _sync(fn(*args))
    times = []
    for _ in range(nrep):
        t0 = time.perf_counter()
        out = _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:32s}: {np.median(times)*1e3:9.2f} ms")
    return out


def main(nconfig=500):
    from fixtures_pbc import load_cell
    from pyqmc_tpu.system.supercell import get_supercell
    from pyqmc_tpu.models.orbitals import KPointOrbitals
    from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
    from pyqmc_tpu.models.jastrow import JastrowSpin
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.observables.ecp import ECPAccumulator
    from pyqmc_tpu.configs import initial_guess
    from pyqmc_tpu.wftools import default_jastrow_basis

    cell, d = load_cell("diamond_primitive")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    kpts = np.asarray(d["kpts"])
    nocc = 4  # 4 valence electrons per prim cell / spin pairs: 8 e- per cell
    blocks = [np.asarray(d["mo_coeff"][k])[:, :nocc] for k in range(len(kpts))]
    orb = KPointOrbitals(cell, kpts, (blocks, blocks), img_tol=1e-4)
    print(f"backend={jax.default_backend()} nconfig={nconfig} "
          f"natom={sup.natom} nelec={sup.nelec} nimages={len(orb.images)}")
    norb = sum(b.shape[1] for b in blocks)
    wf = Slater(sup, orb, DeterminantExpansion.single(norb, norb))
    params = wf.make_params()
    a_b, b_b = default_jastrow_basis(sup)
    jas = JastrowSpin(sup, a_basis=a_b, b_basis=b_b)
    jp = jas.make_params()
    configs = initial_guess(sup, nconfig, key=jax.random.PRNGKey(0))
    pos = configs.positions

    rec = jax.jit(lambda p, x: wf.recompute(p, x))
    st = timeit("kpoint slater recompute", rec, params, pos)
    gl = jax.jit(lambda p, s, x: wf.gradient_laplacian(p, s, jnp.int32(0), x[:, 0]))
    timeit("kpoint slater grad_laplacian", gl, params, st, pos)
    recj = jax.jit(lambda p, x: jas.recompute(p, x))
    stj = timeit("pbc jastrow recompute", recj, jp, pos)
    glj = jax.jit(lambda p, s, x: jas.gradient_laplacian(p, s, jnp.int32(0), x[:, 0]))
    timeit("pbc jastrow grad_laplacian", glj, jp, stj, pos)
    ecp = ECPAccumulator(sup, naip=6)
    ecpf = jax.jit(
        lambda p, s, x: ecp(wf, p, s, x, jax.random.PRNGKey(1))
    )
    timeit("ecp (all electrons)", ecpf, params, st, pos)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
