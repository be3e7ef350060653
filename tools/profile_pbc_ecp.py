"""Component profile of the periodic ECP quadrature sweep (diamond-C 2x2x2).

The c_solid e2e profile shows the ECP pass is ~88% of the periodic VMC
step (95 ms/step of 108). This tool splits that pass on the TRIM tier by
timing the full accumulator against reduced variants:

  full SJ        — ECPAccumulator(sup)(MultiplyWF(slater, jastrow), ...)
  slater only    — same with the bare Slater (difference = Jastrow
                   testvalue at the aux points)
  geometry only  — a stub wavefunction whose testvalue is 1 (difference =
                   Slater det-ratio sweep incl. the k-point orbital eval)
  bare orbitals  — KPointOrbitals.eval(mode 0) at the same flat point
                   count (the orbital share of the Slater piece)

Run (TPU): python tools/profile_pbc_ecp.py [nconfig]
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


def timeit(name, fn, *args, nrep=5):
    _sync(fn(*args))
    ts = []
    for _ in range(nrep):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:36s}: {med:9.2f} ms")
    return med


class _OnesWF:
    """Stub: testvalue == 1 so the ECP pass runs only geometry+downselect."""

    ratio_is_modulus = False

    def testvalue(self, params, state, e, epos):
        return jnp.ones(epos.shape[:-1], epos.dtype), None


def main(nconfig=200):
    from fixtures_pbc import load_cell
    from pyqmc_tpu.system.supercell import get_supercell
    from pyqmc_tpu.models.orbitals import KPointOrbitals
    from pyqmc_tpu.models.slater import Slater, DeterminantExpansion
    from pyqmc_tpu.models.jastrow import JastrowSpin
    from pyqmc_tpu.models.multiply import MultiplyWF
    from pyqmc_tpu.observables.ecp import ECPAccumulator
    from pyqmc_tpu.configs import initial_guess
    from pyqmc_tpu.wftools import default_jastrow_basis

    cell, d = load_cell("diamond_primitive")
    sup = get_supercell(cell, 2 * np.eye(3, dtype=int))
    kpts = np.asarray(d["kpts"])
    blocks = [np.asarray(d["mo_coeff"][k])[:, :4] for k in range(len(kpts))]
    orb = KPointOrbitals(cell, kpts, (blocks, blocks), img_tol=1e-4)
    norb = 4 * len(kpts)
    slater = Slater(sup, orb, DeterminantExpansion.single(norb, norb))
    a_b, b_b = default_jastrow_basis(sup)
    jas = JastrowSpin(sup, a_basis=a_b, b_basis=b_b)
    sj = MultiplyWF(slater, jas)
    params = sj.make_params()
    sl_params = params["wf0"]
    configs = initial_guess(sup, nconfig, key=jax.random.PRNGKey(0))
    dtype = jnp.float32 if jax.default_backend() != "cpu" else configs.positions.dtype
    pos = configs.positions.astype(dtype)
    params = jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "astype") and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x, params)
    sl_params = params["wf0"]

    ecp = ECPAccumulator(sup)
    nsel = ecp.nselect or ecp.nq_total
    print(f"backend={jax.default_backend()} nconfig={nconfig} "
          f"nelec={sum(sup.nelec)} nq_total={ecp.nq_total} nselect={nsel} "
          f"echunk={ecp.echunk}")

    key = jax.random.PRNGKey(7)
    st_sj = jax.jit(lambda p, x: sj.recompute(p, x))(params, pos)
    st_sl = jax.jit(lambda p, x: slater.recompute(p, x))(sl_params, pos)

    f_sj = jax.jit(lambda p, s, x: ecp(sj, p, s, x, key))
    f_sl = jax.jit(lambda p, s, x: ecp(slater, p, s, x, key))
    ones = _OnesWF()
    f_geom = jax.jit(lambda x: ecp(ones, None, None, x, key))

    t_sj = timeit("ecp full (slater+jastrow)", f_sj, params, st_sj, pos)
    t_sl = timeit("ecp slater-only", f_sl, sl_params, st_sl, pos)
    t_geom = timeit("ecp geometry+downselect only", f_geom, pos)

    # bare orbital eval at the Slater piece's flat point count: the
    # downselected path evaluates nconf*echunk*nselect points per chunk,
    # nelec/echunk chunks
    ne = sum(sup.nelec)
    chunk = ecp.echunk
    if chunk == "auto":
        npts = nsel
        chunk = max(1, 262144 // max(nconfig * npts, 1))
    chunk = min(chunk or ne, ne)
    nchunks = (ne + chunk - 1) // chunk
    flat = jax.random.normal(jax.random.PRNGKey(3),
                             (nconfig * chunk * nsel, 3), dtype)

    def orb_eval(x):
        up, dn = orb.eval(orb.make_params(), x, 0)
        # scalar reduction: keep the sync cheap on the axon tunnel (a full
        # (npts, norb) device_get costs ~1 s of tunnel transfer)
        return jnp.sum(up)

    f_orb = jax.jit(orb_eval)
    t1 = timeit(f"orbital eval mode0 ({flat.shape[0]} pts)", f_orb, flat)
    print(f"  x {nchunks} chunks = {t1 * nchunks:9.2f} ms")
    print(f"\nsplit: jastrow-testvalue {t_sj - t_sl:.2f} ms, "
          f"slater-ratio(incl orbitals) {t_sl - t_geom:.2f} ms, "
          f"geometry+downselect {t_geom:.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
