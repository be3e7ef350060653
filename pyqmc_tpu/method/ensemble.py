"""Excited-state (ensemble) optimization with overlap penalties.

Compact wf-by-wf redesign of pyqmc/method/ensemble_optimization_wfbywf.py
(and the threaded variant): states are optimized against

    Cost_k = E_k + lambda * sum_{j<k} |O_kj|^2

with all expectations taken over the mixture rho = sum_i |psi_i|^2
(importance-sampled ratio estimators make the rho-dependence cancel). The
energy gradient, overlap gradient and SR metric for one state are computed
in a single jitted pass; the (nparam, nparam) solve is host-side.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .sample_many import sample_overlap, _amplitudes


def make_state_gradient_fn(wfs, k, transform, energy_acc):
    """Jitted estimator of the penalty-SR ingredients for state k."""

    def fn(params_list, positions, key):
        states = tuple(
            wf.recompute(p, positions) for wf, p in zip(wfs, params_list)
        )
        a, rho = _amplitudes(wfs, params_list, states)
        wk = jnp.abs(a[k]) ** 2 / rho  # (nconf,)
        el = energy_acc(wfs[k], params_list[k], states[k], positions, key=key)[
            "total"
        ]
        pg = wfs[k].pgradient(params_list[k], positions)
        dp, _ = transform.serialize_gradients_pair(pg)  # real channel (nconf, np)
        nconf = dp.shape[0]
        out = {
            "den": jnp.mean(wk),
            "el_w": jnp.mean(wk * el),
            "dp_el_w": jnp.einsum("c,c,cp->p", wk, el, dp) / nconf,
            "dp_w": jnp.einsum("c,cp->p", wk, dp) / nconf,
            "dpdp_w": jnp.einsum("c,ci,cj->ij", wk, dp, dp) / nconf,
            "nkk": jnp.mean(jnp.abs(a[k]) ** 2 / rho),
        }
        for j in range(len(wfs)):
            cross = jnp.conj(a[k]) * a[j] / rho
            out[f"n_{j}"] = jnp.mean(jnp.real(cross))
            out[f"dp_n_{j}"] = jnp.einsum("c,cp->p", jnp.real(cross), dp) / nconf
        return out

    return jax.jit(fn)


def delta_p_state(k, est, taus, penalty, eps=1e-3, nlower=None):
    """Host-side penalty-SR step from averaged estimator dicts."""
    den = est["den"]
    e_k = est["el_w"] / den
    grad_e = 2.0 * (est["dp_el_w"] - e_k * est["dp_w"]) / den
    g = grad_e.copy()
    nkk = est["nkk"]
    for j in range(nlower if nlower is not None else k):
        njj = est.get(f"njj_{j}", None)
        n_kj = est[f"n_{j}"]
        o_kj = n_kj / np.sqrt(nkk * est[f"njj_{j}"]) if njj else n_kj / nkk
        d_o = (est[f"dp_n_{j}"] - n_kj * est["dp_w"] / nkk) / nkk
        g = g + 2.0 * penalty * o_kj * d_o
    dpm = est["dp_w"] / den
    S = est["dpdp_w"] / den - np.outer(dpm, dpm)
    step = np.linalg.solve(S + eps * np.eye(len(g)), g)
    return [-tau * step for tau in taus], e_k


def optimize_ensemble(
    wfs,
    params_list,
    transforms,
    configs,
    energy_acc,
    key=None,
    max_iterations=10,
    penalty=2.0,
    tau=0.1,
    nblocks=6,
    nsteps=10,
    tstep=0.5,
    verbose=False,
):
    """Optimize every state against all lower states.

    transforms: list of LinearTransform (None = state frozen).
    Returns (params_list, records).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    params_list = list(params_list)
    grad_fns = [
        make_state_gradient_fn(wfs, k, t, energy_acc) if t is not None else None
        for k, t in enumerate(transforms)
    ]
    records = []
    for it in range(max_iterations):
        key, skey = jax.random.split(key)
        data, configs = sample_overlap(
            wfs, params_list, configs, skey, nblocks=nblocks, nsteps=nsteps,
            tstep=tstep, energy_acc=energy_acc,
        )
        overlap = np.mean([d["overlap"] for d in data], axis=0)
        rec = {"iteration": it, "overlap": overlap}
        for k, (t, gfn) in enumerate(zip(transforms, grad_fns)):
            if t is None:
                continue
            key, gkey = jax.random.split(key)
            est = jax.tree.map(
                np.asarray, gfn(tuple(params_list), configs.positions, gkey)
            )
            # normalized lower-state overlaps need N_jj too
            for j in range(k):
                est[f"njj_{j}"] = float(np.real(overlap[j, j]))
            steps, e_k = delta_p_state(k, est, [tau], penalty)
            flat = t.serialize(params_list[k]) + jnp.asarray(steps[0])
            params_list[k] = t.deserialize(params_list[k], flat)
            rec[f"energy{k}"] = float(e_k)
        records.append(rec)
        if verbose:
            es = {kk: v for kk, v in rec.items() if kk.startswith("energy")}
            print(f"ensemble iter {it}: {es} |O01|="
                  f"{abs(overlap[0,1]/np.sqrt(abs(overlap[0,0]*overlap[1,1]))):.4f}"
                  if overlap.shape[0] > 1 else "", flush=True)
    return params_list, records
