"""H2O micro-benchmarks (counterpart of the reference's asv suite,
benchmarks/h2o_benchmark.py:6-45). Times the individual wavefunction kernels
on the current backend, on the SAME config the reference's asv suite uses:
ccECP pseudopotential H2O in a cc-pVDZ-quality basis (the committed SCF
checkpoint h2o_ccecp-ccpvdz_ccecp_scf.hdf5 is loaded so no SCF runs here).

Run: python benchmarks/h2o_benchmark.py [nconfig] [basis] [ecp]
     python benchmarks/h2o_benchmark.py 500 sto-3g none   # all-electron toy
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # on the remote axon tunnel block_until_ready alone does not guarantee
    # execution finished; pulling bytes to host does
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]
    return out


def timeit(name, fn, *args, nrep=5):
    out = _sync(fn(*args))
    times = []
    for _ in range(nrep):
        t0 = time.perf_counter()
        out = _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{name:32s}: {np.median(times)*1e3:9.3f} ms")
    return out


def main(nconfig=500, basis="ccecp-ccpvdz", ecp="ccecp"):
    from pyqmc_tpu.system.mole import Molecule
    from pyqmc_tpu.system.scf import run_scf
    from pyqmc_tpu.models.slater import Slater
    from pyqmc_tpu.models.jastrow import JastrowSpin
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.observables.energy import kinetic_energy
    from pyqmc_tpu.configs import initial_guess

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"h2o_{basis}_{ecp}_scf.hdf5".replace("/", "_"),
    )
    if os.path.exists(cache):
        import h5py
        from pyqmc_tpu.system.io import load_system

        with h5py.File(cache, "r") as f:
            mol, mf = load_system(f)
    else:
        mol = Molecule(
            "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
            basis=basis, ecp=ecp,
        )
        mf = run_scf(mol)
    slater = Slater.from_mean_field(mf)
    jastrow = JastrowSpin(mol)
    sp = slater.make_params()
    jp = jastrow.make_params()
    configs = initial_guess(mol, nconfig, key=jax.random.PRNGKey(0))
    pos = configs.positions
    acc = EnergyAccumulator(mol)
    print(f"backend={jax.default_backend()} nconfig={nconfig} "
          f"basis={basis} ecp={ecp}")

    rec_s = jax.jit(lambda p, x: slater.recompute(p, x))
    st = timeit("slater recompute", rec_s, sp, pos)
    gl_s = jax.jit(
        lambda p, s, x: slater.gradient_laplacian(p, s, jnp.int32(0), x[:, 0])
    )
    timeit("slater gradient_laplacian", gl_s, sp, st, pos)
    pg_s = jax.jit(lambda p, x: slater.pgradient(p, x))
    timeit("slater pgradient", pg_s, sp, pos)

    rec_j = jax.jit(lambda p, x: jastrow.recompute(p, x))
    stj = timeit("jastrow recompute", rec_j, jp, pos)
    gl_j = jax.jit(
        lambda p, s, x: jastrow.gradient_laplacian(p, s, jnp.int32(0), x[:, 0])
    )
    timeit("jastrow gradient_laplacian", gl_j, jp, stj, pos)
    pg_j = jax.jit(lambda p, x: jastrow.pgradient(p, x))
    timeit("jastrow pgradient", pg_j, jp, pos)

    en = jax.jit(
        lambda p, s, x: acc(slater, p, s, x, key=jax.random.PRNGKey(1))
    )
    timeit("energy (full accumulator)", en, sp, st, pos)


if __name__ == "__main__":
    nconfig = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    basis = sys.argv[2] if len(sys.argv) > 2 else "ccecp-ccpvdz"
    ecp = sys.argv[3] if len(sys.argv) > 3 else "ccecp"
    main(nconfig, basis, None if ecp in ("none", "None") else ecp)
