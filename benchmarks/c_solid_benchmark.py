"""Periodic diamond-C benchmark (counterpart of the reference's
benchmarks/c_solid_benchmark.py:10-45): k-point Slater + Jastrow kernel
timings AND end-to-end SJ-VMC throughput on the 2x2x2 diamond supercell
(16 C atoms, 64 valence electrons, ccECP), on two twist tiers:

  * TRIM: the 2x2x2 Monkhorst-Pack k-mesh is realified (all twists are
    time-reversal-invariant momenta) -> real orbital arithmetic;
  * general twist: k-mesh shifted off TRIM -> PairKSlater real-pair
    arithmetic (the path whose pair algebra ~4x's the matmul work).

Uses the extracted reference SCF fixture for MO coefficients
(tests/files/diamond_primitive.npz, KRKS e_tot -10.5075 Ha/prim cell —
the recorded energy-sanity anchor).

Run: python benchmarks/c_solid_benchmark.py [nconfig]
     python benchmarks/c_solid_benchmark.py [nconfig] --kernels-only
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


E_FIXTURE_PER_CELL = -10.5075  # KRKS e_tot of the committed fixture

# measured by tools/baseline_cpu_pbc.py on this host: the reference's
# execution model (host Python loop per electron, numpy Sherman-Morrison,
# jitted k-point orbital kernels standing in for numba pbcgto, per-step
# kinetic + per-(electron, atom) ECP quadrature + Ewald) on the same
# diamond-C 2x2x2 TRIM config. None until measured.
BASELINE_PBC_WALKER_STEPS_PER_SEC = None


def e2e_vmc(nconfig=500, nsteps=10, general_twist=False, nwarm=6, nrep=4,
            profile=False):
    """End-to-end SJ-VMC walker-steps/s on the diamond 2x2x2 supercell.

    profile=True additionally times move-only and no-ECP block variants
    (differential phase split: move sweep / ECP quadrature / kinetic+Ewald
    per step, the bench.py methodology) — the periodic counterpart of the
    H2O profile (VERDICT r3 item 5).

    Returns (walker_steps_per_s, energy_per_prim_cell)."""
    from fixtures_pbc import load_cell
    from pyqmc_tpu.system.supercell import get_supercell
    from pyqmc_tpu.models.orbitals import KPointOrbitals
    from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
    from pyqmc_tpu.models.slater_pair import PairKSlater
    from pyqmc_tpu.models.jastrow import JastrowSpin
    from pyqmc_tpu.models.multiply import MultiplyWF
    from pyqmc_tpu.observables.accumulators import EnergyAccumulator
    from pyqmc_tpu.method.vmc import make_vmc_block
    from pyqmc_tpu.configs import initial_guess
    from pyqmc_tpu.wftools import default_jastrow_basis

    cell, d = load_cell("diamond_primitive")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    kpts = np.asarray(d["kpts"])
    nocc = 4
    blocks = [np.asarray(d["mo_coeff"][k])[:, :nocc] for k in range(len(kpts))]
    norb = nocc * len(kpts)
    expn = DeterminantExpansion.single(norb, norb)
    if general_twist:
        kpts = kpts + np.array([0.023, -0.017, 0.011])
        orb = KPointOrbitals(cell, kpts, (blocks, blocks), realify=False,
                             img_tol=1e-4)
        slater = PairKSlater(sup, orb, expn)
        tag = "general-twist PairKSlater"
    else:
        orb = KPointOrbitals(cell, kpts, (blocks, blocks), img_tol=1e-4)
        slater = Slater(sup, orb, expn)
        tag = f"TRIM (real_mode={orb.real_mode})"
    a_b, b_b = default_jastrow_basis(sup)
    sj = MultiplyWF(slater, JastrowSpin(sup, a_basis=a_b, b_basis=b_b))
    params = sj.make_params()
    acc = {"energy": EnergyAccumulator(sup)}
    configs = initial_guess(sup, nconfig, key=jax.random.PRNGKey(3))
    dtype = jnp.float32 if jax.default_backend() != "cpu" else configs.positions.dtype
    pos = configs.positions.astype(dtype)
    wrap = configs.wrap
    params = jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "astype") and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x,
        params,
    )
    block = make_vmc_block(sj, acc, configs.geometry, tstep=0.5, nsteps=nsteps)
    key = jax.random.PRNGKey(4)
    t_compile = time.perf_counter()
    # compile + equilibrate + axon execution warmup (first ~4 post-compile
    # executions run up to 5x slow on the tunnel)
    for _ in range(max(nwarm, 5)):
        key, bk = jax.random.split(key)
        pos, wrap, avg = block(params, pos, wrap, bk)
        _ = float(avg["energytotal"])
    t_compile = time.perf_counter() - t_compile
    # pipelined steady-state timing (dispatch all, one sync at the end),
    # matching the production vmc() lag-1 pipeline
    avgs = []
    t0 = time.perf_counter()
    for _ in range(nrep):
        key, bk = jax.random.split(key)
        pos, wrap, avg = block(params, pos, wrap, bk)
        avgs.append(avg)
    for a in avgs:
        _ = float(a["energytotal"])  # forced sync (axon tunnel)
    dt = (time.perf_counter() - t0) / nrep
    rate = nconfig * nsteps / dt
    ncell = 8  # 2x2x2 supercell of the primitive cell
    e_cell = float(avg["energytotal"]) / ncell
    vsb = (f", vs_baseline {rate / BASELINE_PBC_WALKER_STEPS_PER_SEC:,.0f}x"
           if BASELINE_PBC_WALKER_STEPS_PER_SEC else "")
    print(
        f"e2e SJ-VMC [{tag}] backend={jax.default_backend()} "
        f"nconfig={nconfig} nsteps={nsteps}: {rate:,.0f} walker-steps/s"
        f"{vsb} (block {dt*1e3:.1f} ms, warm+compile {t_compile:.1f} s)  "
        f"E/cell {e_cell:.4f} Ha (fixture KRKS {E_FIXTURE_PER_CELL}, "
        f"delta {e_cell - E_FIXTURE_PER_CELL:+.4f})"
    )
    if profile:
        def _steady(blk, p, w):
            for _ in range(max(nwarm, 5)):
                nonlocal_key = jax.random.fold_in(key, id(blk) % 1000)
                p, w, a = blk(params, p, w, nonlocal_key)
                _ = float(jax.tree.leaves(a)[0])
            outs = []
            t0 = time.perf_counter()
            for r in range(nrep):
                p, w, a = blk(params, p, w, jax.random.fold_in(key, r))
                outs.append(a)
            for a in outs:
                _ = float(jax.tree.leaves(a)[0])
            return (time.perf_counter() - t0) / nrep, p, w

        move_blk = make_vmc_block(sj, {}, configs.geometry, tstep=0.5,
                                  nsteps=nsteps)
        t_move, pos, wrap = _steady(move_blk, pos, wrap)
        noecp = {"energy": EnergyAccumulator(sup, ecp_acc=False)}
        noecp_blk = make_vmc_block(sj, noecp, configs.geometry, tstep=0.5,
                                   nsteps=nsteps)
        t_noecp, pos, wrap = _steady(noecp_blk, pos, wrap)
        print(
            f"  profile (ms/step): move {t_move / nsteps * 1e3:.3f}, "
            f"ecp {max(dt - t_noecp, 0.0) / nsteps * 1e3:.3f}, "
            f"kinetic+ewald {max(t_noecp - t_move, 0.0) / nsteps * 1e3:.3f}"
        )
    return rate, e_cell


if __name__ == "__main__":
    nconfig = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 500
    main(nconfig)
    if "--kernels-only" not in sys.argv:
        e2e_vmc(nconfig, general_twist=False, profile="--profile" in sys.argv)
        e2e_vmc(nconfig, general_twist=True, profile="--profile" in sys.argv)
