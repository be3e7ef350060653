"""Reference-style CPU baseline for bench.py.

The reference (WagnerGroup/pyqmc) cannot run here (no pyscf), so this script
reproduces its *execution model* for the same benchmark workload: H2O
Slater-Jastrow VMC with a host-side Python loop over electrons per step,
numpy batched over walkers, Sherman-Morrison row updates, drift-diffusion
Metropolis (pyqmc/method/mc.py:102-153 semantics), plus the same
per-step energy accumulator sweep (kinetic via per-electron laplacian +
open Coulomb). The number it prints is the denominator used for
bench.py's vs_baseline.

Run: python tools/baseline_cpu.py
"""

import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.ops.gto import GTOSpec, eval_gto
from pyqmc_tpu.models.func3d import default_ee_basis, default_ei_basis


def np_eval_gto(spec, X, mode):
    """numpy wrapper over the (non-jitted, CPU) GTO evaluator."""
    out = eval_gto(spec, jax.numpy.asarray(X), mode=mode)
    if mode == 0:
        return np.asarray(out)
    return tuple(np.asarray(o) for o in out)


def run_baseline(nconf=512, nsteps=20, tstep=0.5, seed=0):
    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867", basis="sto-3g"
    )
    mf = run_scf(mol)
    spec = GTOSpec.from_molecule(mol)
    nup, ndn = mol.nelec
    nelec = nup + ndn
    Ca = np.asarray(mf.mo_coeff[0][:, :nup])
    Cb = np.asarray(mf.mo_coeff[1][:, :ndn])
    rng = np.random.default_rng(seed)

    # initialize walkers near nuclei
    centers = np.repeat(mol.atom_coords, [8, 1, 1], axis=0)[:nelec]
    pos = centers[None] + rng.normal(size=(nconf, nelec, 3))

    def mos(X, C):
        return np_eval_gto(spec, X, 0) @ C

    def recompute(pos):
        aos = np_eval_gto(spec, pos.reshape(-1, 3), 0).reshape(nconf, nelec, -1)
        mu = aos[:, :nup] @ Ca
        md = aos[:, nup:] @ Cb
        inv_u = np.linalg.inv(mu)
        inv_d = np.linalg.inv(md)
        return inv_u, inv_d

    inv_u, inv_d = recompute(pos)

    t0 = time.perf_counter()
    naccept = 0
    for step in range(nsteps):
        for e in range(nelec):
            up = e < nup
            inv = inv_u if up else inv_d
            C = Ca if up else Cb
            row = e if up else e - nup
            ao, ao_g = np_eval_gto(spec, pos[:, e], 1)
            mo_g = np.einsum("cxa,ak->cxk", ao_g, C)
            grad = np.einsum("cxk,ck->cx", mo_g, inv[:, :, row])
            gn = np.linalg.norm(grad, axis=1, keepdims=True)
            drift = np.where(gn > 1, grad / gn, grad)
            gauss = rng.normal(size=(nconf, 3)) * np.sqrt(tstep)
            newpos = pos[:, e] + gauss + tstep * drift
            ao2, ao2_g = np_eval_gto(spec, newpos, 1)
            mo_new = ao2 @ C
            ratio = np.einsum("ck,ck->c", mo_new, inv[:, :, row])
            mo2_g = np.einsum("cxa,ak->cxk", ao2_g, C)
            grad_new = np.einsum("cxk,ck->cx", mo2_g, inv[:, :, row]) / ratio[:, None]
            gn2 = np.linalg.norm(grad_new, axis=1, keepdims=True)
            drift_new = np.where(gn2 > 1, grad_new / gn2, grad_new)
            forward = np.sum(gauss**2, axis=1)
            backward = np.sum((gauss + tstep * (drift + drift_new)) ** 2, axis=1)
            tprob = np.exp((forward - backward) / (2 * tstep))
            acc = ratio**2 * tprob > rng.uniform(size=nconf)
            naccept += acc.sum()
            # Sherman-Morrison masked update (slater.py:23-29 semantics)
            idx = np.where(acc)[0]
            if len(idx):
                invs = inv[idx]
                u = mo_new[idx]
                t = np.einsum("ck,ckj->cj", u, invs)
                r = t[:, row]
                col = invs[:, :, row].copy()
                invs -= np.einsum("ci,cj->cij", col, t) / r[:, None, None]
                invs[:, :, row] = col / r[:, None]
                inv[idx] = invs
                pos[idx, e] = newpos[idx]
        # accumulator sweep: kinetic + coulomb each step
        for e in range(nelec):
            up = e < nup
            inv = inv_u if up else inv_d
            C = Ca if up else Cb
            row = e if up else e - nup
            ao, ao_g, ao_l = np_eval_gto(spec, pos[:, e], 2)
            lap = np.einsum("ck,ck->c", ao_l @ C, inv[:, :, row])
        d = pos[:, :, None, :] - pos[:, None, :, :]
        r = np.sqrt((d**2).sum(-1))
        iu = np.triu_indices(nelec, 1)
        ee = (1.0 / r[:, iu[0], iu[1]]).sum(1)
    dt = time.perf_counter() - t0
    rate = nconf * nsteps / dt
    print(f"reference-style CPU baseline: {rate:.1f} walker-steps/s "
          f"(nconf={nconf}, accept={naccept/(nconf*nsteps*nelec):.3f})")
    return rate


if __name__ == "__main__":
    run_baseline()
