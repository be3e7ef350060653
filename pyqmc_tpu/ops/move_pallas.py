"""Pallas TPU kernel: fused Metropolis electron sweep for Slater-Jastrow.

The XLA sweep (method/vmc.py ebody) runs ~30 small kernels per electron
move — drift contraction, AO eval, MO matmul, det ratio, Jastrow delta,
accept select, Sherman-Morrison, cache update — each round-tripping the
(nconf, ...) walker state through HBM. At H2O production shapes every one
of those ops is a (2048, small) operand: latency+bandwidth, no reuse.

This kernel fuses ONE FULL SWEEP (all nelec moves) into a single
pallas_call: the per-walker state (positions, per-spin determinant
inverses, phase/logdet, the 4-slot orbital value+gradient cache, the
Jastrow scalar U) lives in VMEM for the whole sweep, laid out
features-on-sublanes x walkers-on-lanes, and only enters/leaves HBM once
per step. The electron loop is fully unrolled (static spin/row indices),
the AO value+gradient evaluation reuses the gto_pallas playbook
(power/harmonic tables in registers), and the Jastrow radial bases are the
same pure-jnp func3d formulas evaluated on (natom|nelec, T) tiles.

Semantics are EXACTLY method/vmc.py's sweep for the supported pattern
(reference semantics: pyqmc/method/mc.py:102-137):
    MultiplyWF(Slater single-det [molecular, occ = first n orbitals],
               JastrowSpin) -- or either factor alone -- with open-boundary
    geometry and real dtype, consuming the same pre-drawn gauss/unif
    arrays, so the fused and XLA paths produce identical chains to fp
    rounding (tests/unit/test_move_pallas.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gto import GTOSpec
from .harmonics import cart2sph_matrix, cart_components
from ..models import func3d


def _prep_groups(spec: GTOSpec):
    groups = []
    for g in spec.groups:
        centers = spec.atom_coords[np.asarray(g.shell_atoms)]
        C = cart2sph_matrix(g.l)
        comps = cart_components(g.l)
        groups.append((g.l, centers, np.asarray(g.alpha), np.asarray(g.coef),
                       C, comps))
    return groups


def _emit_ao_valgrad(xt, table_refs, groups, nao):
    """In-kernel AO value+gradient at points xt (3, T), concat shell order.

    Returns (ao, gx, gy, gz) each (nao, T). Same derivative algebra as
    ops/gto.eval_gto mode=1; adapted from gto_pallas.build_pallas_evaluator
    with the laplacian terms dropped.
    """
    rows_v = [None] * nao
    rows_g = [[None] * nao for _ in range(3)]
    rowi = 0
    for gi, (l, centers_np, alpha_np, coef_np, C_np, comps) in enumerate(groups):
        cen = table_refs[3 * gi][:]  # (S, 3)
        alpha = table_refs[3 * gi + 1][:]  # (S, P)
        coef = table_refs[3 * gi + 2][:]  # (S, P)
        S, P = alpha_np.shape
        rx = xt[0][None, :] - cen[:, 0][:, None]  # (S, T)
        ry = xt[1][None, :] - cen[:, 1][:, None]
        rz = xt[2][None, :] - cen[:, 2][:, None]
        r2 = rx * rx + ry * ry + rz * rz
        g0 = jnp.zeros_like(r2)
        g1 = jnp.zeros_like(r2)
        for p in range(P):
            a_p = alpha[:, p][:, None]
            e = coef[:, p][:, None] * jnp.exp(-a_p * r2)
            g0 = g0 + e
            g1 = g1 + a_p * e
        one = jnp.ones_like(rx)
        pw = {0: [one, rx], 1: [one, ry], 2: [one, rz]}
        for k in range(2, l + 1):
            pw[0].append(pw[0][-1] * rx)
            pw[1].append(pw[1][-1] * ry)
            pw[2].append(pw[2][-1] * rz)

        def mono(i, j, k):
            return pw[0][i] * pw[1][j] * pw[2][k]

        P_c = [mono(i, j, k) for (i, j, k) in comps]
        dP = [[], [], []]
        for (i, j, k) in comps:
            for ax, n in enumerate((i, j, k)):
                if n == 0:
                    dP[ax].append(None)
                else:
                    e2 = [i, j, k]
                    e2[ax] -= 1
                    dP[ax].append(n * mono(*e2))
        rvec = (rx, ry, rz)
        nsph = 2 * l + 1
        for q in range(nsph):
            val = None
            gcart = [None, None, None]
            for c, (i, j, k) in enumerate(comps):
                w = float(C_np[c, q])
                if w == 0.0:
                    continue
                vt = P_c[c] * g0
                val = w * vt if val is None else val + w * vt
                for ax in range(3):
                    gt = -2.0 * rvec[ax] * P_c[c] * g1
                    if dP[ax][c] is not None:
                        gt = gt + dP[ax][c] * g0
                    gcart[ax] = w * gt if gcart[ax] is None else gcart[ax] + w * gt
            for si in range(S):
                # concat row order: shell-major, sph-minor within a group
                rows_v[rowi + si * nsph + q] = val[si]
                for ax in range(3):
                    rows_g[ax][rowi + si * nsph + q] = gcart[ax][si]
        rowi += S * nsph
    ao = jnp.stack(rows_v, axis=0)
    gx = jnp.stack(rows_g[0], axis=0)
    gy = jnp.stack(rows_g[1], axis=0)
    gz = jnp.stack(rows_g[2], axis=0)
    return ao, gx, gy, gz


def _emit_ao_val(xt, table_refs, groups, nao):
    """In-kernel value-only AOs at points xt (3, T), concat shell order.

    Returns ao (nao, T) — the value rows of _emit_ao_valgrad without the
    derivative algebra (used by the T-move quadrature ratios)."""
    rows_v = [None] * nao
    rowi = 0
    for gi, (l, centers_np, alpha_np, coef_np, C_np, comps) in enumerate(groups):
        cen = table_refs[3 * gi][:]
        alpha = table_refs[3 * gi + 1][:]
        coef = table_refs[3 * gi + 2][:]
        S, P = alpha_np.shape
        rx = xt[0][None, :] - cen[:, 0][:, None]
        ry = xt[1][None, :] - cen[:, 1][:, None]
        rz = xt[2][None, :] - cen[:, 2][:, None]
        r2 = rx * rx + ry * ry + rz * rz
        g0 = jnp.zeros_like(r2)
        for p in range(P):
            g0 = g0 + coef[:, p][:, None] * jnp.exp(-alpha[:, p][:, None] * r2)
        one = jnp.ones_like(rx)
        pw = {0: [one, rx], 1: [one, ry], 2: [one, rz]}
        for k in range(2, l + 1):
            pw[0].append(pw[0][-1] * rx)
            pw[1].append(pw[1][-1] * ry)
            pw[2].append(pw[2][-1] * rz)
        P_c = [pw[0][i] * pw[1][j] * pw[2][k] * g0 for (i, j, k) in comps]
        nsph = 2 * l + 1
        for q in range(nsph):
            val = None
            for c in range(len(comps)):
                w = float(C_np[c, q])
                if w == 0.0:
                    continue
                val = w * P_c[c] if val is None else val + w * P_c[c]
            for si in range(S):
                rows_v[rowi + si * nsph + q] = val[si]
        rowi += S * nsph
    return jnp.stack(rows_v, axis=0)


def _basis_eval(b, r):
    if b.kind == "polypade":
        return func3d.polypade_all(r, b.param, b.rcut)
    return func3d.cutoffcusp_all(r, b.param, b.rcut)


def _basis_eval_value(b, r):
    return _basis_eval(b, r)[0]


def _legendre_static(l, x):
    """P_l(x), static l (observables/ecp.legendre formulas)."""
    if l == 0:
        return jnp.ones_like(x)
    if l == 1:
        return x
    if l == 2:
        return 0.5 * (3 * x * x - 1)
    if l == 3:
        return 0.5 * (5 * x**3 - 3 * x)
    if l == 4:
        return 0.125 * (35 * x**4 - 30 * x**2 + 3)
    if l == 5:
        return 0.125 * (63 * x**5 - 70 * x**3 + 15 * x)
    if l == 6:
        return 0.0625 * (231 * x**6 - 315 * x**4 + 105 * x**2 - 5)
    raise ValueError(l)


def _match_sj(wf, geometry):
    """Pattern gate shared by the fused-sweep builders: open-boundary
    MultiplyWF(single-det molecular Slater with occ = the first n orbitals,
    JastrowSpin) — or either factor alone — with both spin channels
    non-empty. Returns (slater, jastrow, sl_idx, j_idx) or None."""
    if getattr(geometry, "lattice", None) is not None:
        return None
    from ..models.multiply import MultiplyWF
    from ..models.slater import Slater
    from ..models.jastrow import JastrowSpin
    from ..models.orbitals import MolecularOrbitals

    factors = list(wf.wfs) if isinstance(wf, MultiplyWF) else [wf]
    slater = jastrow = None
    sl_idx = j_idx = None
    for i, f in enumerate(factors):
        if isinstance(f, Slater) and slater is None:
            slater, sl_idx = f, i
        elif isinstance(f, JastrowSpin) and jastrow is None:
            jastrow, j_idx = f, i
        else:
            return None
    if slater is None:
        return None
    if not isinstance(slater.orbitals, MolecularOrbitals):
        return None
    exp = slater.expansion
    nup, ndn = slater.nup, slater.ndn
    if nup == 0 or ndn == 0:
        return None
    if len(exp.map_up) != 1 or exp.occ_up.shape[0] != 1 or exp.occ_dn.shape[0] != 1:
        return None
    # occ must be the first n orbitals so the mog cache (all norb orbitals)
    # coincides with the occ-selected columns the kernel maintains
    if slater.orbitals.norb != (nup, ndn):
        return None
    if not (np.array_equal(exp.occ_up[0], np.arange(nup))
            and np.array_equal(exp.occ_dn[0], np.arange(ndn))):
        return None
    if jastrow is not None:
        if any(b.kind not in ("polypade", "cutoffcusp")
               for b in jastrow.a_basis + jastrow.b_basis):
            return None
        if getattr(jastrow.geometry, "lattice", None) is not None:
            return None
    return slater, jastrow, sl_idx, j_idx


def _quad_static(ecp_acc):
    """Static quadrature data unrolled into python constants, emitted in the
    SAME order as observables/ecp._quadrature_geometry (naip groups sorted
    ascending, atoms within a group in nl_atoms order) so a selection-
    uniform stream shared with the XLA path picks identical categories even
    for heterogeneous per-atom naip. Returns
    ([(atom coord, [(px, py, pz, wq), ...], [(l, coeffs, exps, powers)...])],
     nq_total) or None when unsupported (periodic / l > 6)."""
    if not ecp_acc.nl_atoms:
        return None
    if getattr(ecp_acc, "_lattice", None) is not None:
        return None
    naip = ecp_acc.atom_naip
    order = [i for n in sorted(set(naip))
             for i in range(len(naip)) if naip[i] == n]
    quad = []
    nq_total = 0
    for i in order:
        aecp = ecp_acc.nl_atoms[i]
        pts_a, w_a = ecp_acc.atom_quad[i]
        coord = tuple(float(c) for c in ecp_acc.atom_coords[aecp.atom])
        pts = [(float(p[0]), float(p[1]), float(p[2]), float(wq))
               for p, wq in zip(np.asarray(pts_a), np.asarray(w_a))]
        chans = [(int(ch.l), tuple(ch.coeffs), tuple(ch.exps),
                  tuple(ch.powers)) for ch in aecp.nonlocal_channels]
        if any(l > 6 for l, *_ in chans):
            return None
        quad.append((coord, pts, chans))
        nq_total += len(pts)
    return quad, nq_total


def build_fused_sweep(wf, geometry, tstep, drift_cutoff=1.0, tile=None,
                      interpret=False, mode="vmc"):
    """Fused-sweep builder. Returns
    sweep(params, positions, wrap, state, gauss_step, unif_step)
      -> (positions, wrap, state, acc)                      [mode="vmc"]
      -> (positions, wrap, state, (acc, r2p, r2a))          [mode="dmc"]
    matching method/vmc.py's (resp. method/dmc.py's drift-diffusion)
    sweep contract, or None when the wavefunction/geometry pattern is not
    supported (caller falls back to the XLA sweep). mode="dmc" applies
    Umrigar drift limiting, fixed-node sign rejection, and returns the
    per-walker proposed/accepted squared-displacement sums the effective-
    timestep damping needs (method/dmc.py sweep, reference dmc.py:22-70).
    """
    m = _match_sj(wf, geometry)
    if m is None:
        # periodic TRIM-realified pattern: delegate to the k-point kernel
        from .move_pallas_pbc import build_fused_sweep_pbc

        return build_fused_sweep_pbc(
            wf, geometry, tstep, drift_cutoff=drift_cutoff, tile=tile,
            interpret=interpret, mode=mode,
        )
    slater, jastrow, sl_idx, j_idx = m
    from ..models.multiply import MultiplyWF

    nup, ndn = slater.nup, slater.ndn
    spec = slater.orbitals.spec
    nao = spec.nao
    nelec = nup + ndn
    groups = _prep_groups(spec)
    concat_rows = np.argsort(spec.perm)  # AO order -> concat order
    if jastrow is not None:
        natom = jastrow.natom
        na = len(jastrow.a_basis)
        nb = len(jastrow.b_basis)
        atom_coords = np.asarray(jastrow.atom_coords)
        spin = np.asarray(jastrow._spin)  # (nelec,) 0/1
        a_basis, b_basis = jastrow.a_basis, jastrow.b_basis

    from ..models.slater import SlaterState
    from ..models.jastrow import JastrowState

    ngroups = len(groups)

    def kernel(*refs):
        # ---- unpack refs (order must match `inputs` below) ----------------
        it = iter(range(len(refs)))
        posr = refs[next(it)]
        invur = refs[next(it)]
        invdr = refs[next(it)]
        phur = refs[next(it)]
        ldur = refs[next(it)]
        phdr = refs[next(it)]
        lddr = refs[next(it)]
        mogur = refs[next(it)]
        mogdr = refs[next(it)]
        gaussr = refs[next(it)]
        unifr = refs[next(it)]
        car = refs[next(it)]
        cbr = refs[next(it)]
        if jastrow is not None:
            ur = refs[next(it)]
            ac0r = refs[next(it)]
            ac1r = refs[next(it)]
            bc0r = refs[next(it)]
            bc1r = refs[next(it)]
            atomr = refs[next(it)]
        tables = [refs[next(it)] for _ in range(3 * ngroups)]
        opos = refs[next(it)]
        oinvu = refs[next(it)]
        oinvd = refs[next(it)]
        ophu = refs[next(it)]
        oldu = refs[next(it)]
        ophd = refs[next(it)]
        oldd = refs[next(it)]
        omogu = refs[next(it)]
        omogd = refs[next(it)]
        if jastrow is not None:
            ou = refs[next(it)]
        onacc = refs[next(it)]
        if mode == "dmc":
            or2p = refs[next(it)]
            or2a = refs[next(it)]

        pos = posr[:]            # (3*nelec, T)
        invs = {0: invur[:], 1: invdr[:]}   # (n*n, T)
        phase = {0: phur[:], 1: phdr[:]}    # (1, T)
        logdet = {0: ldur[:], 1: lddr[:]}
        mog = {0: mogur[:], 1: mogdr[:]}    # (n*4*n, T)
        cr = {0: car[:], 1: cbr[:]}         # (nao, n) concat-row order
        gauss = gaussr[:]        # (3*nelec, T)
        unif = unifr[:]          # (nelec, T)
        T = pos.shape[1]
        dtype = pos.dtype
        if jastrow is not None:
            u_j = ur[:][0]       # (T,)
            acs = {0: ac0r[:], 1: ac1r[:]}  # (natom, na)
            bcs = {0: bc0r[:], 1: bc1r[:]}  # (nb, nelec)
            acoords = atomr[:]   # (natom, 3)
        nacc = jnp.zeros((T,), dtype)

        def jastrow_delta(ex, ey, ez, e, s):
            """U terms + gradient for electron e at (ex, ey, ez) each (T,).

            Mirrors JastrowSpin._delta_terms(want_derivs=True) minus the
            laplacian. Returns (u (T,), [gx, gy, gz] each (T,))."""
            # e-ion
            dix = ex[None, :] - acoords[:, 0][:, None]
            diy = ey[None, :] - acoords[:, 1][:, None]
            diz = ez[None, :] - acoords[:, 2][:, None]
            r_ei = jnp.sqrt(dix * dix + diy * diy + diz * diz)  # (natom, T)
            u = jnp.zeros((T,), dtype)
            g = [jnp.zeros((T,), dtype) for _ in range(3)]
            ac = acs[s]
            for k, b in enumerate(a_basis):
                v, fo, _ = _basis_eval(b, r_ei)
                w = ac[:, k][:, None]  # (natom, 1)
                u = u + jnp.sum(w * v, axis=0)
                for ax, d in enumerate((dix, diy, diz)):
                    g[ax] = g[ax] + jnp.sum(w * fo * d, axis=0)
            # e-e (all other electrons at their current positions)
            pex = pos.reshape(nelec, 3, T)
            dex = ex[None, :] - pex[:, 0, :]  # (nelec, T)
            dey = ey[None, :] - pex[:, 1, :]
            dez = ez[None, :] - pex[:, 2, :]
            r_ee = jnp.sqrt(dex * dex + dey * dey + dez * dez)
            eidx = jax.lax.broadcasted_iota(jnp.int32, (nelec, 1), 0)
            notself = (eidx != e).astype(dtype)
            bc = bcs[s]
            for k, b in enumerate(b_basis):
                v, fo, _ = _basis_eval(b, r_ee)
                w = bc[k, :][:, None] * notself  # (nelec, 1)
                u = u + jnp.sum(w * v, axis=0)
                for ax, d in enumerate((dex, dey, dez)):
                    g[ax] = g[ax] + jnp.sum(w * fo * d, axis=0)
            return u, g

        def limdrift(g):
            if mode == "dmc":
                # Umrigar: v * (sqrt(1 + 2 v^2 tau) - 1) / (v^2 tau)
                v2 = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
                taueff = jnp.maximum(v2 * tstep, 1e-12)
                fac = (jnp.sqrt(1.0 + 2.0 * taueff) - 1.0) / taueff
                return [gi * fac for gi in g]
            tot = jnp.sqrt(g[0] * g[0] + g[1] * g[1] + g[2] * g[2])
            scale = jnp.where(tot > drift_cutoff, drift_cutoff / tot, 1.0)
            return [gi * scale for gi in g]

        if mode == "dmc":
            r2p = jnp.zeros((T,), dtype)
            r2a = jnp.zeros((T,), dtype)

        for e in range(nelec):
            s = 0 if e < nup else 1
            n = nup if s == 0 else ndn
            row = e if s == 0 else e - nup
            inv = invs[s].reshape(n, n, T)
            mg = mog[s].reshape(n, 4, n, T)
            ex, ey, ez = pos[3 * e], pos[3 * e + 1], pos[3 * e + 2]

            # --- move_begin: drift at the current position ---------------
            # Slater: det-ratio contraction on the cached value+grad MOs
            invrow = [inv[j, row] for j in range(n)]  # each (T,)
            r4 = []
            for slot in range(4):
                acc = None
                for j in range(n):
                    term = mg[row, slot, j] * invrow[j]
                    acc = term if acc is None else acc + term
                r4.append(acc)
            g_old = [r4[1 + ax] / r4[0] for ax in range(3)]
            if jastrow is not None:
                u_old_e, gj = jastrow_delta(ex, ey, ez, e, s)
                g_old = [g_old[ax] + gj[ax] for ax in range(3)]
            drift_old = limdrift(g_old)

            # --- propose (open boundary: no wrap) ------------------------
            gx_e = gauss[3 * e]
            gy_e = gauss[3 * e + 1]
            gz_e = gauss[3 * e + 2]
            nx = ex + gx_e + tstep * drift_old[0]
            ny = ey + gy_e + tstep * drift_old[1]
            nz = ez + gz_e + tstep * drift_old[2]

            # --- move_finish: AO+MO value/grad at the proposal -----------
            xt = jnp.stack([nx, ny, nz], axis=0)  # (3, T)
            ao, gxa, gya, gza = _emit_ao_valgrad(xt, tables, groups, nao)
            crs = cr[s]  # (nao, n)
            mo = jnp.dot(crs.T, ao, preferred_element_type=dtype)  # (n, T)
            gmo = [jnp.dot(crs.T, ga, preferred_element_type=dtype)
                   for ga in (gxa, gya, gza)]
            ratio_sl = None
            for j in range(n):
                term = mo[j] * invrow[j]
                ratio_sl = term if ratio_sl is None else ratio_sl + term
            g_new = []
            for ax in range(3):
                acc = None
                for j in range(n):
                    term = gmo[ax][j] * invrow[j]
                    acc = term if acc is None else acc + term
                g_new.append(acc / ratio_sl)
            # gradient_value's ratio is the raw row contraction (the cached
            # current-value contraction r4[0] is exactly 1 in the XLA path)
            ratio = ratio_sl
            if jastrow is not None:
                u_new_e, gj = jastrow_delta(nx, ny, nz, e, s)
                du = u_new_e - u_old_e
                ratio = ratio * jnp.exp(du)
                g_new = [g_new[ax] + gj[ax] for ax in range(3)]
            drift_new = limdrift(g_new)

            # --- Metropolis accept --------------------------------------
            forward = gx_e * gx_e + gy_e * gy_e + gz_e * gz_e
            bx = gx_e + tstep * (drift_old[0] + drift_new[0])
            by = gy_e + tstep * (drift_old[1] + drift_new[1])
            bz = gz_e + tstep * (drift_old[2] + drift_new[2])
            backward = bx * bx + by * by + bz * bz
            t_prob = jnp.exp((forward - backward) / (2.0 * tstep))
            accept_prob = jnp.abs(ratio) ** 2 * t_prob
            if mode == "dmc":
                # fixed-node: reject node crossings (real dtype only here)
                accept_prob = jnp.where(ratio <= 0, 0.0, accept_prob)
            accept = accept_prob > unif[e]  # (T,) bool
            accf = accept.astype(dtype)
            nacc = nacc + accf
            if mode == "dmc":
                px = gx_e + tstep * drift_old[0]
                py = gy_e + tstep * drift_old[1]
                pz = gz_e + tstep * drift_old[2]
                r2 = px * px + py * py + pz * pz
                r2p = r2p + r2
                r2a = r2a + jnp.where(accept, r2, 0.0)

            # --- updateinternals: Sherman-Morrison + caches -------------
            tvec = []
            for j in range(n):
                acc = None
                for k in range(n):
                    term = mo[k] * inv[k, j]
                    acc = term if acc is None else acc + term
                tvec.append(acc)  # t_j = sum_k mo_k inv[k, j]
            rsm = tvec[row]  # det ratio of the row replacement
            inv_rows = []
            for i in range(n):
                col_i = inv[i, row]
                rr = []
                for j in range(n):
                    if j == row:
                        newv = col_i / rsm
                    else:
                        newv = inv[i, j] - col_i * tvec[j] / rsm
                    rr.append(jnp.where(accept, newv, inv[i, j]))
                inv_rows.append(jnp.stack(rr, axis=0))
            invs[s] = jnp.stack(inv_rows, axis=0).reshape(n * n, T)
            absr = jnp.abs(rsm)
            safe = jnp.where(absr == 0, 1.0, absr)
            phase[s] = jnp.where(
                accept[None, :], phase[s] * (rsm / safe)[None, :], phase[s]
            )
            logdet[s] = jnp.where(
                accept[None, :], logdet[s] + jnp.log(safe)[None, :], logdet[s]
            )
            # orbital cache rows for electron `row`: [value; grad]
            mgrows = []
            for i in range(n):
                for slot in range(4):
                    for j in range(n):
                        if i == row:
                            newv = (mo[j] if slot == 0 else gmo[slot - 1][j])
                            mgrows.append(jnp.where(accept, newv, mg[i, slot, j]))
                        else:
                            mgrows.append(mg[i, slot, j])
            mog[s] = jnp.stack(mgrows, axis=0)
            # positions
            prow = []
            for i in range(3 * nelec):
                if i == 3 * e:
                    prow.append(jnp.where(accept, nx, pos[i]))
                elif i == 3 * e + 1:
                    prow.append(jnp.where(accept, ny, pos[i]))
                elif i == 3 * e + 2:
                    prow.append(jnp.where(accept, nz, pos[i]))
                else:
                    prow.append(pos[i])
            pos = jnp.stack(prow, axis=0)
            if jastrow is not None:
                u_j = jnp.where(accept, u_j + du, u_j)

        # ---- write back ---------------------------------------------------
        opos[:] = pos
        oinvu[:] = invs[0]
        oinvd[:] = invs[1]
        ophu[:] = phase[0]
        oldu[:] = logdet[0]
        ophd[:] = phase[1]
        oldd[:] = logdet[1]
        omogu[:] = mog[0]
        omogd[:] = mog[1]
        if jastrow is not None:
            ou[:] = u_j[None, :]
        onacc[:] = nacc[None, :]
        if mode == "dmc":
            or2p[:] = r2p[None, :]
            or2a[:] = r2a[None, :]

    def sweep(params, positions, wrap, state, gauss_step, unif_step):
        """Drop-in for method/vmc.py's sweep: one fused-kernel call."""
        nconf = positions.shape[0]
        dtype = positions.dtype
        t = tile or (256 if nconf % 256 == 0 and nconf >= 256 else 128)
        # pad the walker (lane) axis to a tile multiple with edge replicas;
        # padded lanes run the same chain and are discarded on output
        Mp = ((nconf + t - 1) // t) * t
        npad = Mp - nconf
        grid = (Mp // t,)

        def padw(x):
            return jnp.pad(x, ((0, 0), (0, npad)), mode="edge") if npad else x

        if isinstance(wf, MultiplyWF):
            sl_state = state[sl_idx]
            sl_params = params[f"wf{sl_idx}"]
        else:
            sl_state = state
            sl_params = params

        def tcol(x, rows):
            # (nconf, ...) -> (rows, nconf): feature-major, walkers on lanes
            return x.reshape(nconf, rows).T

        pos_t = tcol(positions, 3 * nelec)
        invu = tcol(sl_state.inv_up, nup * nup)
        invd = tcol(sl_state.inv_dn, ndn * ndn)
        phu = tcol(sl_state.phase_up, 1)
        ldu = tcol(sl_state.logdet_up, 1)
        phd = tcol(sl_state.phase_dn, 1)
        ldd = tcol(sl_state.logdet_dn, 1)
        mogu = tcol(sl_state.mog_up, nup * 4 * nup)
        mogd = tcol(sl_state.mog_dn, ndn * 4 * ndn)
        gauss_t = gauss_step.transpose(0, 2, 1).reshape(3 * nelec, nconf)
        unif_t = unif_step
        ca = sl_params["mo_coeff_alpha"][jnp.asarray(concat_rows)]
        cb = sl_params["mo_coeff_beta"][jnp.asarray(concat_rows)]

        inputs = [padw(x) for x in (pos_t, invu, invd, phu, ldu, phd, ldd,
                                    mogu, mogd, gauss_t, unif_t)] + [ca, cb]
        blocked = [3 * nelec, nup * nup, ndn * ndn, 1, 1, 1, 1,
                   nup * 4 * nup, ndn * 4 * ndn, 3 * nelec, nelec]
        in_specs = [
            pl.BlockSpec((r, t), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in blocked
        ]
        in_specs += [
            pl.BlockSpec(ca.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        if jastrow is not None:
            j_state = state[j_idx]
            j_params = params[f"wf{j_idx}"]
            u_t = padw(j_state.u.reshape(nconf, 1).T)
            ac = j_params["acoeff"]  # (natom, na, 2)
            bc = j_params["bcoeff"]  # (nb, 3)
            spin_j = jnp.asarray(spin)
            extras = [u_t, ac[:, :, 0], ac[:, :, 1],
                      bc[:, spin_j], bc[:, 1 + spin_j],
                      jnp.asarray(atom_coords, dtype)]
            inputs += extras
            in_specs += [
                pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec(x.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
                for x in extras[1:]
            ]
        for (l, centers, alpha, coef, C, comps) in groups:
            for arr in (centers, alpha, coef):
                a = jnp.asarray(arr, dtype)
                inputs.append(a)
                in_specs.append(pl.BlockSpec(
                    a.shape,
                    functools.partial(lambda nd, i: (0,) * nd, a.ndim),
                    memory_space=pltpu.VMEM,
                ))

        out_rows = [3 * nelec, nup * nup, ndn * ndn, 1, 1, 1, 1,
                    nup * 4 * nup, ndn * 4 * ndn]
        if jastrow is not None:
            out_rows.append(1)
        out_rows.append(1)  # nacc
        if mode == "dmc":
            out_rows += [1, 1]  # r2p, r2a
        out_shape = [jax.ShapeDtypeStruct((r, Mp), dtype) for r in out_rows]
        out_specs = [
            pl.BlockSpec((r, t), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in out_rows
        ]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*inputs)
        outs = [o[:, :nconf] for o in outs]
        (pos_o, invu_o, invd_o, phu_o, ldu_o, phd_o, ldd_o, mogu_o,
         mogd_o, *rest) = outs
        r2p_o = r2a_o = None
        if mode == "dmc":
            *rest, r2p_o, r2a_o = rest
        if jastrow is not None:
            u_o, nacc = rest
        else:
            (nacc,) = rest

        positions_o = pos_o.T.reshape(nconf, nelec, 3)
        new_sl = SlaterState(
            inv_up=invu_o.T.reshape(nconf, 1, nup, nup),
            inv_dn=invd_o.T.reshape(nconf, 1, ndn, ndn),
            phase_up=phu_o.T.reshape(nconf, 1),
            logdet_up=ldu_o.T.reshape(nconf, 1),
            phase_dn=phd_o.T.reshape(nconf, 1),
            logdet_dn=ldd_o.T.reshape(nconf, 1),
            mog_up=mogu_o.T.reshape(nconf, nup, 4, nup),
            mog_dn=mogd_o.T.reshape(nconf, ndn, 4, ndn),
        )
        if isinstance(wf, MultiplyWF):
            new_state = list(state)
            new_state[sl_idx] = new_sl
            if jastrow is not None:
                new_state[j_idx] = JastrowState(
                    positions=positions_o, u=u_o.T.reshape(nconf)
                )
            new_state = tuple(new_state)
        else:
            new_state = new_sl
        # acc: sum over electrons of the per-electron mean acceptance ==
        # mean over walkers of the per-walker accept count
        acc = jnp.mean(nacc)
        if mode == "dmc":
            return positions_o, wrap, new_state, (
                acc, r2p_o.reshape(nconf), r2a_o.reshape(nconf)
            )
        return positions_o, wrap, new_state, acc

    return sweep


def build_fused_tmove_sweep(wf, geometry, ecp_acc, tau, tile=None,
                            interpret=False, max_aux_evals=128):
    """Fused Pallas kernel for the Casula T-move sweep (method/dmc.py
    tmove_sweep + observables/ecp.py tmove_quadrature/_quadrature_geometry).

    Per electron, entirely in VMEM: quadrature geometry (per-walker
    rotations consumed as inputs so the streams match the XLA path),
    radial channels x Legendre projectors, value-only AO+MO ratio at every
    aux point, heat-bath selection with the reverse-amplitude acceptance,
    then the Sherman-Morrison/cache update at the chosen point. Profiling
    showed the XLA T-move sweep at ~1.87 ms/step (74% of the H2O DMC
    block) — ~50 small HBM-round-tripping ops per electron, the same
    disease the fused Metropolis sweep cured.

    Returns tmove(params, positions, wrap, state, rot, u_sel, u_acc)
      -> (positions, wrap, state)
    with rot (nelec, nconf, 3, 3) = random_rotations(tqkeys[e], (nconf,))
    per electron, or None when unsupported (molecular pattern of
    build_fused_sweep + static quadrature small enough to unroll).
    """
    m = _match_sj(wf, geometry)
    if m is None:
        return None
    slater, jastrow, sl_idx, j_idx = m
    from ..models.multiply import MultiplyWF

    nup, ndn = slater.nup, slater.ndn
    nelec = nup + ndn
    # static quadrature data in the XLA emission order (group order fix:
    # heterogeneous per-atom naip now picks identical categories from the
    # shared u_sel stream in the fused and XLA paths)
    q = _quad_static(ecp_acc)
    if q is None:
        return None
    quad, nq_total = q
    if nelec * (nq_total + 2) > max_aux_evals * 2:
        return None  # unrolled kernel would be too large to compile
    rmax = float(ecp_acc.rmax)

    spec = slater.orbitals.spec
    nao = spec.nao
    groups = _prep_groups(spec)
    concat_rows = np.argsort(spec.perm)
    natom = jastrow.natom if jastrow is not None else 0
    if jastrow is not None:
        a_basis, b_basis = jastrow.a_basis, jastrow.b_basis
        atom_coords = np.asarray(jastrow.atom_coords)
        spin = np.asarray(jastrow._spin)

    from ..models.slater import SlaterState
    from ..models.jastrow import JastrowState

    ngroups = len(groups)

    def kernel(*refs):
        it = iter(range(len(refs)))
        posr = refs[next(it)]
        invur = refs[next(it)]
        invdr = refs[next(it)]
        phur = refs[next(it)]
        ldur = refs[next(it)]
        phdr = refs[next(it)]
        lddr = refs[next(it)]
        mogur = refs[next(it)]
        mogdr = refs[next(it)]
        rotr = refs[next(it)]
        uselr = refs[next(it)]
        uaccr = refs[next(it)]
        car = refs[next(it)]
        cbr = refs[next(it)]
        if jastrow is not None:
            ur = refs[next(it)]
            ac0r = refs[next(it)]
            ac1r = refs[next(it)]
            bc0r = refs[next(it)]
            bc1r = refs[next(it)]
            atomr = refs[next(it)]
        tables = [refs[next(it)] for _ in range(3 * ngroups)]
        opos = refs[next(it)]
        oinvu = refs[next(it)]
        oinvd = refs[next(it)]
        ophu = refs[next(it)]
        oldu = refs[next(it)]
        ophd = refs[next(it)]
        oldd = refs[next(it)]
        omogu = refs[next(it)]
        omogd = refs[next(it)]
        if jastrow is not None:
            ou = refs[next(it)]

        pos = posr[:]
        invs = {0: invur[:], 1: invdr[:]}
        phase = {0: phur[:], 1: phdr[:]}
        logdet = {0: ldur[:], 1: lddr[:]}
        mog = {0: mogur[:], 1: mogdr[:]}
        cr = {0: car[:], 1: cbr[:]}
        rot = rotr[:]          # (nelec*9, T)
        usel = uselr[:]
        uacc = uaccr[:]
        T = pos.shape[1]
        dtype = pos.dtype
        if jastrow is not None:
            u_j = ur[:][0]
            acs = {0: ac0r[:], 1: ac1r[:]}
            bcs = {0: bc0r[:], 1: bc1r[:]}
            acoords = atomr[:]

        def jastrow_u(ex, ey, ez, e, s):
            """Value-only U terms of electron e at (ex, ey, ez)."""
            dix = ex[None, :] - acoords[:, 0][:, None]
            diy = ey[None, :] - acoords[:, 1][:, None]
            diz = ez[None, :] - acoords[:, 2][:, None]
            r_ei = jnp.sqrt(dix * dix + diy * diy + diz * diz)
            u = jnp.zeros((T,), dtype)
            ac = acs[s]
            for k, b in enumerate(a_basis):
                v = _basis_eval_value(b, r_ei)
                u = u + jnp.sum(ac[:, k][:, None] * v, axis=0)
            pex = pos.reshape(nelec, 3, T)
            dex = ex[None, :] - pex[:, 0, :]
            dey = ey[None, :] - pex[:, 1, :]
            dez = ez[None, :] - pex[:, 2, :]
            r_ee = jnp.sqrt(dex * dex + dey * dey + dez * dez)
            eidx = jax.lax.broadcasted_iota(jnp.int32, (nelec, 1), 0)
            notself = (eidx != e).astype(dtype)
            bc = bcs[s]
            for k, b in enumerate(b_basis):
                v = _basis_eval_value(b, r_ee)
                u = u + jnp.sum(bc[k, :][:, None] * notself * v, axis=0)
            return u

        for e in range(nelec):
            s = 0 if e < nup else 1
            n = nup if s == 0 else ndn
            row = e if s == 0 else e - nup
            inv = invs[s].reshape(n, n, T)
            mg = mog[s].reshape(n, 4, n, T)
            ex, ey, ez = pos[3 * e], pos[3 * e + 1], pos[3 * e + 2]
            invrow = [inv[j, row] for j in range(n)]
            R9 = [rot[9 * e + k] for k in range(9)]  # row-major R[x][y]
            if jastrow is not None:
                u_old = jastrow_u(ex, ey, ez, e, s)

            # --- quadrature: T weights, aux points, wf ratios ------------
            w_list, r_list, aux_list, u_list = [], [], [], []
            for (coord, pts, chans) in quad:
                dx = ex - coord[0]
                dy = ey - coord[1]
                dz = ez - coord[2]
                r_a = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                rsafe = jnp.maximum(r_a, 1e-12)
                inside = (r_a < rmax).astype(dtype)
                # radial channel values v_l(r) * (2l+1) * inside
                vch = {}
                for (l, coeffs, exps, powers) in chans:
                    v = jnp.zeros_like(r_a)
                    for c_, e_, n_ in zip(coeffs, exps, powers):
                        v = v + c_ * r_a ** (n_ - 2) * jnp.exp(-e_ * r_a * r_a)
                    vch[(l, coeffs)] = (2 * l + 1) * v * inside
                for (px, py, pz, wq) in pts:
                    ddx = R9[0] * px + R9[1] * py + R9[2] * pz
                    ddy = R9[3] * px + R9[4] * py + R9[5] * pz
                    ddz = R9[6] * px + R9[7] * py + R9[8] * pz
                    costh = (ddx * dx + ddy * dy + ddz * dz) / rsafe
                    Tq = jnp.zeros_like(r_a)
                    for (l, coeffs, exps, powers) in chans:
                        Tq = Tq + vch[(l, coeffs)] * _legendre_static(l, costh)
                    Tq = Tq * wq
                    ax = coord[0] + r_a * ddx
                    ay = coord[1] + r_a * ddy
                    az = coord[2] + r_a * ddz
                    # Slater ratio at the aux point
                    ao = _emit_ao_val(jnp.stack([ax, ay, az], axis=0),
                                      tables, groups, nao)
                    mo_q = jnp.dot(cr[s].T, ao, preferred_element_type=dtype)
                    rsl = None
                    for j in range(n):
                        term = mo_q[j] * invrow[j]
                        rsl = term if rsl is None else rsl + term
                    if jastrow is not None:
                        uq = jastrow_u(ax, ay, az, e, s)
                        rq = rsl * jnp.exp(uq - u_old)
                        u_list.append(uq)
                    else:
                        rq = rsl
                    w_list.append(-tau * Tq)
                    r_list.append(rq)
                    aux_list.append((ax, ay, az))

            nq = len(w_list)
            # --- heat-bath selection (dmc.py tmove_sweep semantics) ------
            amps = [jnp.maximum(0.0, w_list[q] * r_list[q]) for q in range(nq)]
            norm = 1.0 + sum(amps)
            inv_norm = 1.0 / norm
            choice = jnp.zeros((T,), jnp.int32)
            cum = inv_norm  # category 0 = stay
            u_s = usel[e]
            choice = choice + (u_s > cum).astype(jnp.int32)
            for q in range(nq):
                cum = cum + amps[q] * inv_norm
                choice = choice + (u_s > cum).astype(jnp.int32)
            move = choice > 0
            qsel = jnp.clip(choice - 1, 0, nq - 1)
            # gather selected quantities by static select chain
            r_m = r_list[0]
            w_m = w_list[0]
            ax_m, ay_m, az_m = aux_list[0]
            u_m = u_list[0] if jastrow is not None else None
            for q in range(1, nq):
                is_q = qsel == q
                r_m = jnp.where(is_q, r_list[q], r_m)
                w_m = jnp.where(is_q, w_list[q], w_m)
                ax_m = jnp.where(is_q, aux_list[q][0], ax_m)
                ay_m = jnp.where(is_q, aux_list[q][1], ay_m)
                az_m = jnp.where(is_q, aux_list[q][2], az_m)
                if jastrow is not None:
                    u_m = jnp.where(is_q, u_list[q], u_m)
            inv_r = jnp.where(move & (jnp.abs(r_m) > 1e-30), 1.0 / r_m, 0.0)
            back = 1.0
            for q in range(nq):
                amp_b = jnp.maximum(0.0, w_list[q] * r_list[q] * inv_r)
                amp_b = jnp.where(
                    qsel == q, jnp.maximum(0.0, w_m * inv_r), amp_b
                )
                back = back + amp_b
            acc_prob = jnp.where(move, norm / back, 0.0)
            accept = acc_prob > uacc[e]
            nx = jnp.where(accept, ax_m, ex)
            ny = jnp.where(accept, ay_m, ey)
            nz = jnp.where(accept, az_m, ez)

            # --- gradient_value at the merged point + updateinternals ----
            ao, gxa, gya, gza = _emit_ao_valgrad(
                jnp.stack([nx, ny, nz], axis=0), tables, groups, nao
            )
            crs = cr[s]
            mo = jnp.dot(crs.T, ao, preferred_element_type=dtype)
            gmo = [jnp.dot(crs.T, ga, preferred_element_type=dtype)
                   for ga in (gxa, gya, gza)]
            tvec = []
            for j in range(n):
                acc_ = None
                for k in range(n):
                    term = mo[k] * inv[k, j]
                    acc_ = term if acc_ is None else acc_ + term
                tvec.append(acc_)
            rsm = tvec[row]
            inv_rows = []
            for i in range(n):
                col_i = inv[i, row]
                rr = []
                for j in range(n):
                    if j == row:
                        newv = col_i / rsm
                    else:
                        newv = inv[i, j] - col_i * tvec[j] / rsm
                    rr.append(jnp.where(accept, newv, inv[i, j]))
                inv_rows.append(jnp.stack(rr, axis=0))
            invs[s] = jnp.stack(inv_rows, axis=0).reshape(n * n, T)
            absr = jnp.abs(rsm)
            safe = jnp.where(absr == 0, 1.0, absr)
            phase[s] = jnp.where(
                accept[None, :], phase[s] * (rsm / safe)[None, :], phase[s]
            )
            logdet[s] = jnp.where(
                accept[None, :], logdet[s] + jnp.log(safe)[None, :], logdet[s]
            )
            mgrows = []
            for i in range(n):
                for slot in range(4):
                    for j in range(n):
                        if i == row:
                            newv = (mo[j] if slot == 0 else gmo[slot - 1][j])
                            mgrows.append(
                                jnp.where(accept, newv, mg[i, slot, j])
                            )
                        else:
                            mgrows.append(mg[i, slot, j])
            mog[s] = jnp.stack(mgrows, axis=0)
            prow = []
            for i in range(3 * nelec):
                if i == 3 * e:
                    prow.append(nx)
                elif i == 3 * e + 1:
                    prow.append(ny)
                elif i == 3 * e + 2:
                    prow.append(nz)
                else:
                    prow.append(pos[i])
            pos = jnp.stack(prow, axis=0)
            if jastrow is not None:
                u_j = jnp.where(accept, u_j + (u_m - u_old), u_j)

        opos[:] = pos
        oinvu[:] = invs[0]
        oinvd[:] = invs[1]
        ophu[:] = phase[0]
        oldu[:] = logdet[0]
        ophd[:] = phase[1]
        oldd[:] = logdet[1]
        omogu[:] = mog[0]
        omogd[:] = mog[1]
        if jastrow is not None:
            ou[:] = u_j[None, :]

    def tmove(params, positions, wrap, state, rot, u_sel, u_acc):
        nconf = positions.shape[0]
        dtype = positions.dtype
        t = tile or (256 if nconf % 256 == 0 and nconf >= 256 else 128)
        Mp = ((nconf + t - 1) // t) * t
        npad = Mp - nconf
        grid = (Mp // t,)

        def padw(x):
            return jnp.pad(x, ((0, 0), (0, npad)), mode="edge") if npad else x

        if isinstance(wf, MultiplyWF):
            sl_state = state[sl_idx]
            sl_params = params[f"wf{sl_idx}"]
        else:
            sl_state = state
            sl_params = params

        def tcol(x, rows):
            return x.reshape(nconf, rows).T

        rot_t = rot.reshape(nelec, nconf, 9).transpose(0, 2, 1).reshape(
            9 * nelec, nconf
        )
        inputs = [padw(x) for x in (
            tcol(positions, 3 * nelec),
            tcol(sl_state.inv_up, nup * nup),
            tcol(sl_state.inv_dn, ndn * ndn),
            tcol(sl_state.phase_up, 1),
            tcol(sl_state.logdet_up, 1),
            tcol(sl_state.phase_dn, 1),
            tcol(sl_state.logdet_dn, 1),
            tcol(sl_state.mog_up, nup * 4 * nup),
            tcol(sl_state.mog_dn, ndn * 4 * ndn),
            rot_t, u_sel, u_acc,
        )]
        ca = sl_params["mo_coeff_alpha"][jnp.asarray(concat_rows)]
        cb = sl_params["mo_coeff_beta"][jnp.asarray(concat_rows)]
        inputs += [ca, cb]
        blocked = [3 * nelec, nup * nup, ndn * ndn, 1, 1, 1, 1,
                   nup * 4 * nup, ndn * 4 * ndn, 9 * nelec, nelec, nelec]
        in_specs = [
            pl.BlockSpec((r, t), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in blocked
        ] + [
            pl.BlockSpec(ca.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        if jastrow is not None:
            j_state = state[j_idx]
            j_params = params[f"wf{j_idx}"]
            ac = j_params["acoeff"]
            bc = j_params["bcoeff"]
            spin_j = jnp.asarray(spin)
            extras = [padw(j_state.u.reshape(nconf, 1).T),
                      ac[:, :, 0], ac[:, :, 1],
                      bc[:, spin_j], bc[:, 1 + spin_j],
                      jnp.asarray(atom_coords, dtype)]
            inputs += extras
            in_specs += [
                pl.BlockSpec((1, t), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec(x.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
                for x in extras[1:]
            ]
        for (l, centers, alpha, coef, C, comps) in groups:
            for arr in (centers, alpha, coef):
                a = jnp.asarray(arr, dtype)
                inputs.append(a)
                in_specs.append(pl.BlockSpec(
                    a.shape,
                    functools.partial(lambda nd, i: (0,) * nd, a.ndim),
                    memory_space=pltpu.VMEM,
                ))
        out_rows = [3 * nelec, nup * nup, ndn * ndn, 1, 1, 1, 1,
                    nup * 4 * nup, ndn * 4 * ndn]
        if jastrow is not None:
            out_rows.append(1)
        out_shape = [jax.ShapeDtypeStruct((r, Mp), dtype) for r in out_rows]
        out_specs = [
            pl.BlockSpec((r, t), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in out_rows
        ]
        outs = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
        )(*inputs)
        outs = [o[:, :nconf] for o in outs]
        (pos_o, invu_o, invd_o, phu_o, ldu_o, phd_o, ldd_o, mogu_o,
         mogd_o, *rest) = outs
        positions_o = pos_o.T.reshape(nconf, nelec, 3)
        new_sl = SlaterState(
            inv_up=invu_o.T.reshape(nconf, 1, nup, nup),
            inv_dn=invd_o.T.reshape(nconf, 1, ndn, ndn),
            phase_up=phu_o.T.reshape(nconf, 1),
            logdet_up=ldu_o.T.reshape(nconf, 1),
            phase_dn=phd_o.T.reshape(nconf, 1),
            logdet_dn=ldd_o.T.reshape(nconf, 1),
            mog_up=mogu_o.T.reshape(nconf, nup, 4, nup),
            mog_dn=mogd_o.T.reshape(nconf, ndn, 4, ndn),
        )
        if isinstance(wf, MultiplyWF):
            new_state = list(state)
            new_state[sl_idx] = new_sl
            if jastrow is not None:
                (u_o,) = rest
                new_state[j_idx] = JastrowState(
                    positions=positions_o, u=u_o.T.reshape(nconf)
                )
            new_state = tuple(new_state)
        else:
            new_state = new_sl
        return positions_o, wrap, new_state

    return tmove


def build_fused_ecp_energy(wf, geometry, ecp_acc, tile=None, interpret=False,
                           max_aux_evals=512):
    """Fused Pallas kernel for the nonlocal-ECP energy quadrature — the VMC
    energy accumulator's dominant cost (58% of the H2O headline step in
    BENCH_r04 while the move sweep and T-move kernels already ran fused).

    Per electron, entirely in VMEM: quadrature geometry (per-walker
    rotations consumed as inputs, same streams as
    observables/ecp._quadrature_geometry), radial channels x Legendre
    projectors, and the wavefunction ratio at every aux point. The Slater
    ratio uses the folded form  ratio_q = sum_k ao_k(x_q) wvec_k  with
    wvec = C @ inv[:, row] computed ONCE per electron — one small matmul
    per electron instead of an (n, nao, T) MO matmul per aux point (the
    T-move kernel's formulation).

    Returns ecp_nl(params, positions, state, rot) -> (nconf,) nonlocal
    energy sum_e sum_q T_q ratio_q, with rot (nelec, nconf, 3, 3) =
    random_rotations(fold_in(key, 1000+e), (nconf,)) per electron, or None
    when unsupported (molecular Slater-Jastrow pattern of _match_sj, dense
    evaluation only). Reference semantics: eval_ecp.py:83-132 (ecp_ea).
    """
    m = _match_sj(wf, geometry)
    if m is None:
        return None
    slater, jastrow, sl_idx, j_idx = m
    from ..models.multiply import MultiplyWF

    nup, ndn = slater.nup, slater.ndn
    nelec = nup + ndn
    q = _quad_static(ecp_acc)
    if q is None:
        return None
    quad, nq_total = q
    if nelec * nq_total > max_aux_evals:
        return None  # unrolled kernel too large to compile
    rmax = float(ecp_acc.rmax)

    spec = slater.orbitals.spec
    nao = spec.nao
    groups = _prep_groups(spec)
    concat_rows = np.argsort(spec.perm)
    if jastrow is not None:
        a_basis, b_basis = jastrow.a_basis, jastrow.b_basis
        atom_coords = np.asarray(jastrow.atom_coords)
        spin = np.asarray(jastrow._spin)

    ngroups = len(groups)

    def kernel(*refs):
        it = iter(range(len(refs)))
        posr = refs[next(it)]
        invur = refs[next(it)]
        invdr = refs[next(it)]
        rotr = refs[next(it)]
        car = refs[next(it)]
        cbr = refs[next(it)]
        if jastrow is not None:
            ac0r = refs[next(it)]
            ac1r = refs[next(it)]
            bc0r = refs[next(it)]
            bc1r = refs[next(it)]
            atomr = refs[next(it)]
        tables = [refs[next(it)] for _ in range(3 * ngroups)]
        onl = refs[next(it)]

        pos = posr[:]                      # (3*nelec, T)
        invs = {0: invur[:], 1: invdr[:]}  # (n*n, T)
        rot = rotr[:]                      # (9*nelec, T)
        cr = {0: car[:], 1: cbr[:]}        # (nao, n) concat-row order
        T = pos.shape[1]
        dtype = pos.dtype
        if jastrow is not None:
            acs = {0: ac0r[:], 1: ac1r[:]}
            bcs = {0: bc0r[:], 1: bc1r[:]}
            acoords = atomr[:]

        def jastrow_u(ex, ey, ez, e, s):
            """Value-only U terms of electron e at (ex, ey, ez)."""
            dix = ex[None, :] - acoords[:, 0][:, None]
            diy = ey[None, :] - acoords[:, 1][:, None]
            diz = ez[None, :] - acoords[:, 2][:, None]
            r_ei = jnp.sqrt(dix * dix + diy * diy + diz * diz)
            u = jnp.zeros((T,), dtype)
            ac = acs[s]
            for k, b in enumerate(a_basis):
                v = _basis_eval_value(b, r_ei)
                u = u + jnp.sum(ac[:, k][:, None] * v, axis=0)
            pex = pos.reshape(nelec, 3, T)
            dex = ex[None, :] - pex[:, 0, :]
            dey = ey[None, :] - pex[:, 1, :]
            dez = ez[None, :] - pex[:, 2, :]
            r_ee = jnp.sqrt(dex * dex + dey * dey + dez * dez)
            eidx = jax.lax.broadcasted_iota(jnp.int32, (nelec, 1), 0)
            notself = (eidx != e).astype(dtype)
            bc = bcs[s]
            for k, b in enumerate(b_basis):
                v = _basis_eval_value(b, r_ee)
                u = u + jnp.sum(bc[k, :][:, None] * notself * v, axis=0)
            return u

        nl = jnp.zeros((T,), dtype)
        for e in range(nelec):
            s = 0 if e < nup else 1
            n = nup if s == 0 else ndn
            row = e if s == 0 else e - nup
            inv = invs[s].reshape(n, n, T)
            ex, ey, ez = pos[3 * e], pos[3 * e + 1], pos[3 * e + 2]
            R9 = [rot[9 * e + k] for k in range(9)]  # row-major R[x][y]
            # fold MO coeffs with the inverse row once: (nao, T)
            invrow = jnp.stack([inv[j, row] for j in range(n)], axis=0)
            wvec = jnp.dot(cr[s], invrow, preferred_element_type=dtype)
            if jastrow is not None:
                u_old = jastrow_u(ex, ey, ez, e, s)

            for (coord, pts, chans) in quad:
                dx = ex - coord[0]
                dy = ey - coord[1]
                dz = ez - coord[2]
                r_a = jnp.sqrt(dx * dx + dy * dy + dz * dz)
                rsafe = jnp.maximum(r_a, 1e-12)
                inside = (r_a < rmax).astype(dtype)
                vch = {}
                for (l, coeffs, exps, powers) in chans:
                    v = jnp.zeros_like(r_a)
                    for c_, e_, n_ in zip(coeffs, exps, powers):
                        v = v + c_ * r_a ** (n_ - 2) * jnp.exp(-e_ * r_a * r_a)
                    vch[(l, coeffs)] = (2 * l + 1) * v * inside
                for (px, py, pz, wq) in pts:
                    ddx = R9[0] * px + R9[1] * py + R9[2] * pz
                    ddy = R9[3] * px + R9[4] * py + R9[5] * pz
                    ddz = R9[6] * px + R9[7] * py + R9[8] * pz
                    costh = (ddx * dx + ddy * dy + ddz * dz) / rsafe
                    Tq = jnp.zeros_like(r_a)
                    for (l, coeffs, exps, powers) in chans:
                        Tq = Tq + vch[(l, coeffs)] * _legendre_static(l, costh)
                    Tq = Tq * wq
                    ax = coord[0] + r_a * ddx
                    ay = coord[1] + r_a * ddy
                    az = coord[2] + r_a * ddz
                    ao = _emit_ao_val(jnp.stack([ax, ay, az], axis=0),
                                      tables, groups, nao)
                    rsl = jnp.sum(ao * wvec, axis=0)  # (T,)
                    if jastrow is not None:
                        uq = jastrow_u(ax, ay, az, e, s)
                        rq = rsl * jnp.exp(uq - u_old)
                    else:
                        rq = rsl
                    nl = nl + Tq * rq

        onl[:] = nl[None, :]

    def ecp_nl(params, positions, state, rot):
        nconf = positions.shape[0]
        dtype = positions.dtype
        t = tile or (256 if nconf % 256 == 0 and nconf >= 256 else 128)
        Mp = ((nconf + t - 1) // t) * t
        npad = Mp - nconf
        grid = (Mp // t,)

        def padw(x):
            return jnp.pad(x, ((0, 0), (0, npad)), mode="edge") if npad else x

        if isinstance(wf, MultiplyWF):
            sl_state = state[sl_idx]
            sl_params = params[f"wf{sl_idx}"]
        else:
            sl_state = state
            sl_params = params

        def tcol(x, rows):
            return x.reshape(nconf, rows).T

        rot_t = rot.reshape(nelec, nconf, 9).transpose(0, 2, 1).reshape(
            9 * nelec, nconf
        )
        inputs = [padw(x) for x in (
            tcol(positions, 3 * nelec),
            tcol(sl_state.inv_up, nup * nup),
            tcol(sl_state.inv_dn, ndn * ndn),
            rot_t,
        )]
        ca = sl_params["mo_coeff_alpha"][jnp.asarray(concat_rows)]
        cb = sl_params["mo_coeff_beta"][jnp.asarray(concat_rows)]
        inputs += [ca, cb]
        blocked = [3 * nelec, nup * nup, ndn * ndn, 9 * nelec]
        in_specs = [
            pl.BlockSpec((r, t), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in blocked
        ] + [
            pl.BlockSpec(ca.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        if jastrow is not None:
            j_params = params[f"wf{j_idx}"]
            ac = j_params["acoeff"]
            bc = j_params["bcoeff"]
            spin_j = jnp.asarray(spin)
            extras = [ac[:, :, 0], ac[:, :, 1],
                      bc[:, spin_j], bc[:, 1 + spin_j],
                      jnp.asarray(atom_coords, dtype)]
            inputs += extras
            in_specs += [
                pl.BlockSpec(x.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
                for x in extras
            ]
        for (l, centers, alpha, coef, C, comps) in groups:
            for arr in (centers, alpha, coef):
                a = jnp.asarray(arr, dtype)
                inputs.append(a)
                in_specs.append(pl.BlockSpec(
                    a.shape,
                    functools.partial(lambda nd, i: (0,) * nd, a.ndim),
                    memory_space=pltpu.VMEM,
                ))
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((1, t), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Mp), dtype),
            interpret=interpret,
        )(*inputs)
        return out[0, :nconf]

    return ecp_nl
