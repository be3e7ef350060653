"""Measure the Pallas fused GTO kernel vs the XLA path on real hardware.

VERDICT r1 weak #7 asked for a recorded win at production AO counts or
deletion. Run on the TPU (default env):

    python tools/pallas_gto_bench.py

Times eval_gto(mode=2) — value+grad+lap, the VMC/DMC hot kernel — for
molecule sizes from the bench H2O up to a 24-water cluster, at the point
counts a 2048-walker batch produces.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]
    return out


def timeit(fn, *args, nrep=10):
    _sync(fn(*args))
    ts = []
    for _ in range(nrep):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def water_cluster(n):
    """n water molecules on a cubic grid, 6 bohr apart."""
    base = [("O", (0, 0, 0.2217)), ("H", (0, 1.4309, -0.8867)),
            ("H", (0, -1.4309, -0.8867))]
    side = int(np.ceil(n ** (1 / 3)))
    atoms = []
    k = 0
    for i in range(side):
        for j in range(side):
            for l in range(side):
                if k >= n:
                    break
                off = np.array([i, j, l]) * 6.0
                atoms += [(s, tuple(np.asarray(c) + off)) for s, c in base]
                k += 1
    return atoms


def main():
    from pyqmc_tpu.system.mole import Molecule
    from pyqmc_tpu.ops.gto import GTOSpec, eval_gto
    from pyqmc_tpu.ops.gto_pallas import build_pallas_evaluator

    print("backend:", jax.devices()[0])
    rng = np.random.default_rng(0)
    results = []
    for name, nwater, M in (
        ("H2O ccECP/cc-pVDZ", 1, 16384),
        ("(H2O)8 ccECP/cc-pVDZ", 8, 16384),
        ("(H2O)24 ccECP/cc-pVDZ", 24, 16384),
    ):
        mol = Molecule(water_cluster(nwater), basis="ccecpccpvdz", ecp="ccecp")
        spec = GTOSpec.from_molecule(mol)
        X = jnp.asarray(
            rng.normal(scale=3.0 * nwater ** (1 / 3), size=(M, 3)),
            jnp.float32,
        )
        K = 20  # amortize the axon-tunnel dispatch overhead

        def repeat(f):
            def body(carry, _):
                x, acc = carry
                ao, gr, lp = f(x)
                acc = acc + jnp.sum(ao) + jnp.sum(gr) + jnp.sum(lp)
                return (x + 1e-3, acc), None

            def run(x):
                (xf, acc), _ = jax.lax.scan(
                    body, (x, jnp.float32(0.0)), None, length=K
                )
                return acc

            return jax.jit(run)

        xla_f = lambda x: eval_gto(spec, x, mode=2)
        xla = jax.jit(xla_f)
        t_xla = timeit(repeat(xla_f), X, nrep=5) / K
        try:
            pallas_f = build_pallas_evaluator(spec, tile=512)
            pallas = jax.jit(pallas_f)
            t_pal = timeit(repeat(pallas_f), X, nrep=5) / K
            a1 = xla(X)
            a2 = pallas(X)
            err = max(
                float(jnp.max(jnp.abs(x - y))) for x, y in zip(a1, a2)
            )
        except Exception as e:  # kernel may fail to lower for big specs
            t_pal, err = float("nan"), float("nan")
            print(f"  pallas failed: {type(e).__name__}: {str(e)[:200]}")
        naos = spec.nao
        print(
            f"{name:24s} nao={naos:4d} M={M}: XLA {t_xla*1e3:8.2f} ms  "
            f"pallas {t_pal*1e3:8.2f} ms  speedup {t_xla/t_pal:5.2f}x  "
            f"maxerr {err:.2e}"
        )
        results.append((name, naos, M, t_xla, t_pal))
    return results


if __name__ == "__main__":
    main()
