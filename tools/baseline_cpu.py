"""Reference-style CPU baseline for bench.py.

The reference (WagnerGroup/pyqmc) cannot run here (no pyscf), so this script
reproduces its *execution model* for the same benchmark workload: ccECP
cc-pVDZ H2O Slater VMC with a host-side Python loop over electrons per step,
numpy batched over walkers, Sherman-Morrison row updates, drift-diffusion
Metropolis (pyqmc/method/mc.py:102-153 semantics), a per-step energy
accumulator sweep (kinetic per-electron laplacian + open Coulomb), and the
semi-local ECP quadrature sweep (wavefunction ratios at naip=6 octahedral
points per electron-atom pair, pyqmc/observables/eval_ecp.py:239-336
semantics).

Fairness notes (all favor the baseline):
  * GTO kernels are jit-compiled (XLA CPU), standing in for the reference's
    numba kernels — measured like-for-like compiled-kernel speed, replacing
    the previous "charitably granted 5x" modeled factor.
  * The baseline runs a Slater-only wavefunction; the TPU bench it divides
    into runs full Slater-Jastrow (strictly more work per step).

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

from functools import partial

from pyqmc_tpu.system.mole import Molecule
from pyqmc_tpu.system.scf import run_scf
from pyqmc_tpu.ops.gto import GTOSpec, eval_gto
from pyqmc_tpu.observables.ecp import _parse_ecp, octahedral_grid


def make_np_eval_gto(spec):
    """Jit-compiled (XLA CPU) GTO kernels behind a numpy interface,
    standing in for the reference's numba evaluators."""
    fns = {m: jax.jit(partial(eval_gto, spec, mode=m)) for m in (0, 1, 2)}

    def np_eval(X, mode):
        out = fns[mode](jax.numpy.asarray(X))
        if mode == 0:
            return np.asarray(out)
        return tuple(np.asarray(o) for o in out)

    return np_eval


def _legendre_np(l, x):
    if l == 0:
        return np.ones_like(x)
    if l == 1:
        return x
    if l == 2:
        return 0.5 * (3 * x * x - 1)
    raise ValueError(l)


def run_baseline(nconf=512, nsteps=10, tstep=0.5, seed=0, naip=6):
    mol = Molecule(
        "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
        basis="ccecp-ccpvdz", ecp="ccecp",
    )
    mf = run_scf(mol)
    spec = GTOSpec.from_molecule(mol)
    np_eval_gto = make_np_eval_gto(spec)
    nup, ndn = mol.nelec
    nelec = nup + ndn
    Ca = np.asarray(mf.mo_coeff[0][:, :nup])
    Cb = np.asarray(mf.mo_coeff[1][:, :ndn])
    rng = np.random.default_rng(seed)

    ecp_atoms = _parse_ecp(mol)
    quad_pts, quad_w = octahedral_grid(naip)
    atom_coords = np.asarray(mol.atom_coords)

    # initialize walkers near nuclei
    centers = np.repeat(mol.atom_coords, [max(nelec - 2, 1), 1, 1], axis=0)[:nelec]
    pos = centers[None] + rng.normal(size=(nconf, nelec, 3))

    def recompute(pos):
        aos = np_eval_gto(pos.reshape(-1, 3), 0).reshape(nconf, nelec, -1)
        mu = aos[:, :nup] @ Ca
        md = aos[:, nup:] @ Cb
        return np.linalg.inv(mu), np.linalg.inv(md)

    inv_u, inv_d = recompute(pos)

    # warm the kernel compile cache before timing
    np_eval_gto(pos[:, 0], 1)
    np_eval_gto(pos[:, 0], 2)
    np_eval_gto(pos[:, 0], 0)

    t0 = time.perf_counter()
    naccept = 0
    for step in range(nsteps):
        for e in range(nelec):
            up = e < nup
            inv = inv_u if up else inv_d
            C = Ca if up else Cb
            row = e if up else e - nup
            ao, ao_g = np_eval_gto(pos[:, e], 1)
            mo_g = np.einsum("cxa,ak->cxk", ao_g, C)
            grad = np.einsum("cxk,ck->cx", mo_g, inv[:, :, row])
            gn = np.linalg.norm(grad, axis=1, keepdims=True)
            drift = np.where(gn > 1, grad / gn, grad)
            gauss = rng.normal(size=(nconf, 3)) * np.sqrt(tstep)
            newpos = pos[:, e] + gauss + tstep * drift
            ao2, ao2_g = np_eval_gto(newpos, 1)
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
        # accumulator sweep: kinetic + coulomb + ECP quadrature each step
        for e in range(nelec):
            up = e < nup
            inv = inv_u if up else inv_d
            C = Ca if up else Cb
            row = e if up else e - nup
            ao, ao_g, ao_l = np_eval_gto(pos[:, e], 2)
            lap = np.einsum("ck,ck->c", ao_l @ C, inv[:, :, row])
            # semi-local ECP: ratios at naip points per ECP atom
            for aecp in ecp_atoms:
                R = atom_coords[aecp.atom]
                d = pos[:, e] - R
                r = np.linalg.norm(d, axis=-1)
                dirs = quad_pts  # fixed grid: rotation cost is negligible
                aux = R[None, None] + r[:, None, None] * dirs[None]
                costh = np.einsum("qx,cx->cq", dirs, d / np.maximum(r, 1e-12)[:, None])
                T = np.zeros((nconf, naip))
                for ch in aecp.nonlocal_channels:
                    v = np.zeros(nconf)
                    for c_, e_, n_ in zip(ch.coeffs, ch.exps, ch.powers):
                        v += c_ * r ** (n_ - 2) * np.exp(-e_ * r * r)
                    T += ((2 * ch.l + 1) * v)[:, None] * _legendre_np(ch.l, costh) * quad_w[None]
                mo_aux = np_eval_gto(aux.reshape(-1, 3), 0).reshape(nconf, naip, -1) @ C
                ratios = np.einsum("cqk,ck->cq", mo_aux, inv[:, :, row])
                enl = np.sum(T * ratios, axis=1)
        d = pos[:, :, None, :] - pos[:, None, :, :]
        r = np.sqrt((d**2).sum(-1))
        iu = np.triu_indices(nelec, 1)
        ee = (1.0 / r[:, iu[0], iu[1]]).sum(1)
    dt = time.perf_counter() - t0
    rate = nconf * nsteps / dt
    print(f"reference-style CPU baseline (ccECP/cc-pVDZ H2O, jitted kernels): "
          f"{rate:.1f} walker-steps/s "
          f"(nconf={nconf}, accept={naccept/(nconf*nsteps*nelec):.3f})")
    return rate


if __name__ == "__main__":
    run_baseline()
