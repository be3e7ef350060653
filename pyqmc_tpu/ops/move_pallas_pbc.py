"""Pallas TPU kernel: fused Metropolis electron sweep for PERIODIC
Slater-Jastrow (TRIM-realified k-point orbitals).

Periodic counterpart of ops/move_pallas.build_fused_sweep: one pallas_call
runs the whole nelec-electron sweep with the walker state resident in VMEM.
The supported pattern is MultiplyWF(Slater(KPointOrbitals real_mode,
single det, occ = first n per spin), JastrowSpin) — or the Slater alone —
on a periodic geometry whose Jastrow minimal image reduces to fractional
ROUNDING (every cutoff <= half the minimal interplanar spacing, the
default periodic Jastrow basis; configs.Geometry.minimal_image_for).

Differences from the molecular kernel, all in-kernel:

  * proposals are folded into the SUPERCELL (enforce_pbc semantics:
    frac -> floor -> back), with the accepted wrap deltas accumulated and
    returned so configs.wrap stays exact;
  * orbital evaluation folds the (supercell-folded) point into the
    PRIMITIVE cell and applies the TRIM wrap phase cos(k.wA) = +-1 per
    orbital column (models/orbitals.KPointOrbitals._fold/_eval_folded);
  * the AO pass runs over the culled replicated-shell spec (every kept
    (shell, image) pair its own shell) and is fused DIRECTLY into the MO
    matmul: for each (shell-group, spherical component) the (S, T) value/
    gradient tile contracts against the matching rows of the folded
    coefficient matrix R (nao_repl, n) on the MXU — the 550-row AO vector
    is never materialized (the molecular kernel's per-row scatter is fine
    at 25 AOs, hostile at 550);
  * Jastrow distances apply the rounding minimal image with the supercell
    lattice constants baked in;
  * the electron loop is a lax.fori_loop per spin block (nelec is 64 on
    the diamond benchmark; unrolling 64 moves of 32x32 Sherman-Morrison
    updates the molecular way would explode compile time), with the moved
    row selected/updated by iota masks — Mosaic-friendly and fp-identical
    to gathers;
  * per-orbital algebra is vectorized over (n, T) tiles instead of the
    molecular kernel's per-scalar Python unrolls.

Semantics are EXACTLY method/vmc.py's sweep (mode="vmc") resp.
method/dmc.py's drift-diffusion sweep (mode="dmc") for the supported
pattern, consuming the same pre-drawn gauss/unif streams (reference
semantics: pyqmc/method/mc.py:102-137, dmc.py:22-70); parity tests in
tests/unit/test_move_pallas_pbc.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .move_pallas import _prep_groups, _basis_eval


def _match_sj_pbc(wf, geometry):
    """Pattern gate: periodic MultiplyWF(single-det real-mode k-point
    Slater with occ = the first n orbitals, JastrowSpin) — or the Slater
    alone — with both spin channels non-empty, the Jastrow minimal image
    reducible to fractional rounding, and the Jastrow lattice identical to
    the sampler's. Returns (slater, jastrow, sl_idx, j_idx, orb) or None."""
    lat = getattr(geometry, "lattice", None)
    if lat is None:
        return None
    from ..models.multiply import MultiplyWF
    from ..models.slater import Slater
    from ..models.jastrow import JastrowSpin
    from ..models.orbitals import KPointOrbitals

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
    orb = slater.orbitals
    if not isinstance(orb, KPointOrbitals):
        return None
    if not orb.real_mode or orb._repl_spec is None:
        return None
    exp = slater.expansion
    nup, ndn = slater.nup, slater.ndn
    if nup == 0 or ndn == 0:
        return None
    if len(exp.map_up) != 1 or exp.occ_up.shape[0] != 1 or exp.occ_dn.shape[0] != 1:
        return None
    if orb.norb != (nup, ndn):
        return None
    if not (np.array_equal(exp.occ_up[0], np.arange(nup))
            and np.array_equal(exp.occ_dn[0], np.arange(ndn))):
        return None
    if jastrow is not None:
        if any(b.kind not in ("polypade", "cutoffcusp")
               for b in jastrow.a_basis + jastrow.b_basis):
            return None
        jlat = getattr(jastrow.geometry, "lattice", None)
        if jlat is None or not np.allclose(jlat, lat):
            return None
        # the in-kernel minimal image is fractional rounding; exact only
        # when every basis cutoff fits inside the rounding cell (the gate
        # Geometry.minimal_image_for applies)
        from . import distances as _dist

        mode = _dist.classify_lattice(np.asarray(lat))
        if mode == _dist.MODE_GENERAL:
            heights = 1.0 / np.linalg.norm(
                np.linalg.inv(np.asarray(lat)), axis=0
            )
            r_p = 0.5 * float(np.min(heights))
            rcut_max = max(b.rcut for b in jastrow.a_basis + jastrow.b_basis)
            if rcut_max > r_p + 1e-9:
                return None
    return slater, jastrow, sl_idx, j_idx, orb


def _qsi_rows(spec):
    """Concat-order row permutation [group][q][si]: for each shell group,
    rows regrouped so each spherical component's S shells are contiguous —
    the layout the fused AO->MO matmul consumes. Returns (perm into the
    ORIGINAL AO row order, [per-group (offset, S, nsph)])."""
    concat_of_ao = np.argsort(spec.perm)  # concat position -> AO row
    perm = []
    meta = []
    rowi = 0
    for g in spec.groups:
        S = len(g.shell_atoms)
        nsph = 2 * g.l + 1
        meta.append((len(perm), S, nsph))
        for q in range(nsph):
            for si in range(S):
                perm.append(concat_of_ao[rowi + si * nsph + q])
        rowi += S * nsph
    return np.asarray(perm), meta


def _emit_group_sph(xt, cen, alpha_np, alpha, coef, l, C_np, comps,
                    want_grad=True):
    """Per-(group, spherical-q) value (+gradient) tiles at points xt (3, T).

    Yields nsph tuples (val, gx, gy, gz) each (S, T) — the same derivative
    algebra as move_pallas._emit_ao_valgrad, kept in (S, T) tile form for
    the fused MO contraction instead of scattered into AO rows."""
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
        if want_grad:
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
    if want_grad:
        for (i, j, k) in comps:
            for ax, n_ in enumerate((i, j, k)):
                if n_ == 0:
                    dP[ax].append(None)
                else:
                    e2 = [i, j, k]
                    e2[ax] -= 1
                    dP[ax].append(n_ * mono(*e2))
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
            if want_grad:
                for ax in range(3):
                    gt = -2.0 * rvec[ax] * P_c[c] * g1
                    if dP[ax][c] is not None:
                        gt = gt + dP[ax][c] * g0
                    gcart[ax] = (
                        w * gt if gcart[ax] is None else gcart[ax] + w * gt
                    )
        yield val, gcart[0], gcart[1], gcart[2]


def build_fused_sweep_pbc(wf, geometry, tstep, drift_cutoff=1.0, tile=None,
                          interpret=False, mode="vmc"):
    """Fused periodic-sweep builder; same contract as
    move_pallas.build_fused_sweep (mode="vmc"/"dmc"), or None when the
    wavefunction/geometry pattern is unsupported."""
    m = _match_sj_pbc(wf, geometry)
    if m is None:
        return None
    slater, jastrow, sl_idx, j_idx, orb = m
    from ..models.multiply import MultiplyWF
    from ..models.slater import SlaterState
    from ..models.jastrow import JastrowState

    nup, ndn = slater.nup, slater.ndn
    nelec = nup + ndn
    spec = orb._repl_spec
    groups = _prep_groups(spec)
    row_perm, gmeta = _qsi_rows(spec)
    # supercell + primitive lattice constants baked as python floats
    slat = np.asarray(geometry.lattice, dtype=np.float64)
    slat_inv = np.linalg.inv(slat)
    plat = np.asarray(orb.lattice, dtype=np.float64)
    plat_inv = np.asarray(orb.lattice_inv, dtype=np.float64)
    kpts = np.asarray(orb.kpts)  # (nk, 3)
    nk = kpts.shape[0]
    korb = np.asarray(orb._korb)  # (norb_up + norb_dn,)
    korb_s = {0: korb[:nup], 1: korb[nup:]}
    if jastrow is not None:
        natom = jastrow.natom
        na = len(jastrow.a_basis)
        nb = len(jastrow.b_basis)
        atom_coords = np.asarray(jastrow.atom_coords)
        spin = np.asarray(jastrow._spin)
        a_basis, b_basis = jastrow.a_basis, jastrow.b_basis
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
        gaussr = refs[next(it)]
        unifr = refs[next(it)]
        rur = refs[next(it)]
        rdr = refs[next(it)]
        if jastrow is not None:
            ur = refs[next(it)]
            ac0r = refs[next(it)]
            ac1r = refs[next(it)]
            bc0r = refs[next(it)]
            bc1r = refs[next(it)]
            atomr = refs[next(it)]
        tables = [refs[next(it)] for _ in range(3 * ngroups)]
        opos = refs[next(it)]
        owrapd = refs[next(it)]
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

        # Walker state is read through the INPUT refs (output refs are
        # write-only: with grid > 1 the revolving output buffers are NOT
        # populated from HBM on later grid steps, so reading through
        # aliased outputs silently hands later walker tiles garbage).
        # The mog caches are copied input -> output ref once, then live in
        # the OUTPUT VMEM refs with per-move dynamic-slice row loads/stores
        # (64 KB per move) instead of loop-carried values — the value-
        # carried form held both spins' 2 MB caches live through both spin
        # loops plus the fori_loop carry double, blowing even the raised
        # scoped-VMEM budget at the diamond shapes.
        T = posr.shape[1]
        dtype = posr[:].dtype
        pos = posr[:].reshape(nelec, 3, T)
        omogu[:] = mogur[:]
        omogd[:] = mogdr[:]
        wrapd = jnp.zeros((nelec, 3, T), dtype)
        R = {0: rur[:], 1: rdr[:]}  # (nao_repl, n) in [group][q][si] order
        gauss = gaussr[:].reshape(nelec, 3, T)
        unif = unifr[:]
        if jastrow is not None:
            u_j = ur[:]  # (1, T): loop carries stay rank-2 for Mosaic
            acs = {0: ac0r[:], 1: ac1r[:]}
            bcs = {0: bc0r[:], 1: bc1r[:]}
            acoords = atomr[:]
        else:
            u_j = jnp.zeros((1, T), dtype)
        nacc = jnp.zeros((1, T), dtype)
        r2p = jnp.zeros((1, T), dtype)
        r2a = jnp.zeros((1, T), dtype)

        sl = [[dtype.type(v) for v in row] for row in slat]
        sli = [[dtype.type(v) for v in row] for row in slat_inv]
        pla = [[dtype.type(v) for v in row] for row in plat]
        pli = [[dtype.type(v) for v in row] for row in plat_inv]

        def frac3(x, y, z, M):
            # row-vector convention: f_j = sum_i v_i M[i][j]
            return (
                x * M[0][0] + y * M[1][0] + z * M[2][0],
                x * M[0][1] + y * M[1][1] + z * M[2][1],
                x * M[0][2] + y * M[1][2] + z * M[2][2],
            )

        def mi_super(dx, dy, dz):
            """Rounding minimal image with the supercell lattice."""
            fx, fy, fz = frac3(dx, dy, dz, sli)
            fx = fx - jnp.round(fx)
            fy = fy - jnp.round(fy)
            fz = fz - jnp.round(fz)
            return frac3(fx, fy, fz, sl)

        def mo_valgrad(xt, Rs, n, ksg):
            """(mo, gx, gy, gz) each (n, T) at PRIM-FOLDED points xt with
            the TRIM wrap-phase signs ksg (n, T) applied."""
            mo = jnp.zeros((n, T), dtype)
            gx = jnp.zeros((n, T), dtype)
            gy = jnp.zeros((n, T), dtype)
            gz = jnp.zeros((n, T), dtype)
            for gi, ((l, centers_np, alpha_np, coef_np, C_np, comps),
                     (off, S, nsph)) in enumerate(zip(groups, gmeta)):
                cen = tables[3 * gi][:]
                alpha = tables[3 * gi + 1][:]
                coef = tables[3 * gi + 2][:]
                for q, (val, gxa, gya, gza) in enumerate(_emit_group_sph(
                        xt, cen, alpha_np, alpha, coef, l, C_np, comps)):
                    Rsub = Rs[off + q * S: off + (q + 1) * S, :]  # (S, n)
                    dn = (((0,), (0,)), ((), ()))
                    mo = mo + jax.lax.dot_general(
                        Rsub, val, dn, preferred_element_type=dtype)
                    gx = gx + jax.lax.dot_general(
                        Rsub, gxa, dn, preferred_element_type=dtype)
                    gy = gy + jax.lax.dot_general(
                        Rsub, gya, dn, preferred_element_type=dtype)
                    gz = gz + jax.lax.dot_general(
                        Rsub, gza, dn, preferred_element_type=dtype)
            return mo * ksg, gx * ksg, gy * ksg, gz * ksg

        def fold_prim(x, y, z, ks_np):
            """Primitive-cell fold + TRIM wrap-phase signs.

            Returns (xt (3, T), ksg (n, T)): matches KPointOrbitals._fold
            real-mode branch — sign = where(cos(w A . k) > 0, +1, -1)."""
            fx, fy, fz = frac3(x, y, z, pli)
            wx, wy, wz = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
            xf, yf, zf = frac3(fx - wx, fy - wy, fz - wz, pla)
            wcx, wcy, wcz = frac3(wx, wy, wz, pla)
            signs = []
            for k in range(nk):
                karg = (wcx * dtype.type(kpts[k, 0])
                        + wcy * dtype.type(kpts[k, 1])
                        + wcz * dtype.type(kpts[k, 2]))
                signs.append(jnp.where(jnp.cos(karg) > 0, 1.0, -1.0
                                       ).astype(dtype))
            ksg = jnp.stack([signs[int(k)] for k in ks_np], axis=0)  # (n, T)
            return jnp.stack([xf, yf, zf], axis=0), ksg

        def jastrow_delta(pos, ex, ey, ez, e, s):
            """U terms + gradient for electron e at (ex, ey, ez); minimal-
            image displacements (JastrowSpin._delta_terms semantics). pos is
            the CURRENT loop-carried position array — passed explicitly
            because a closure would capture the stale sweep-entry positions
            (the molecular kernel's Python loop rebinds pos in scope; the
            fori_loop here cannot)."""
            dix = ex[None, :] - acoords[:, 0][:, None]
            diy = ey[None, :] - acoords[:, 1][:, None]
            diz = ez[None, :] - acoords[:, 2][:, None]
            dix, diy, diz = mi_super(dix, diy, diz)
            r_ei = jnp.sqrt(dix * dix + diy * diy + diz * diz)
            u = jnp.zeros((T,), dtype)
            g = [jnp.zeros((T,), dtype) for _ in range(3)]
            ac = acs[s]
            for k, b in enumerate(a_basis):
                v, fo, _ = _basis_eval(b, r_ei)
                w = ac[:, k][:, None]
                u = u + jnp.sum(w * v, axis=0)
                for ax, d in enumerate((dix, diy, diz)):
                    g[ax] = g[ax] + jnp.sum(w * fo * d, axis=0)
            dex = ex[None, :] - pos[:, 0, :]
            dey = ey[None, :] - pos[:, 1, :]
            dez = ez[None, :] - pos[:, 2, :]
            dex, dey, dez = mi_super(dex, dey, dez)
            r_ee = jnp.sqrt(dex * dex + dey * dey + dez * dez)
            eidx = jax.lax.broadcasted_iota(jnp.int32, (nelec, 1), 0)
            notself = (eidx != e).astype(dtype)
            bc = bcs[s]
            for k, b in enumerate(b_basis):
                v, fo, _ = _basis_eval(b, r_ee)
                w = bc[k, :][:, None] * notself
                u = u + jnp.sum(w * v, axis=0)
                for ax, d in enumerate((dex, dey, dez)):
                    g[ax] = g[ax] + jnp.sum(w * fo * d, axis=0)
            return u, g

        def limdrift(g):
            if mode == "dmc":
                v2 = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
                taueff = jnp.maximum(v2 * tstep, 1e-12)
                fac = (jnp.sqrt(1.0 + 2.0 * taueff) - 1.0) / taueff
                return [gi * fac for gi in g]
            tot = jnp.sqrt(g[0] * g[0] + g[1] * g[1] + g[2] * g[2])
            scale = jnp.where(tot > drift_cutoff, drift_cutoff / tot, 1.0)
            return [gi * scale for gi in g]

        def spin_loop(s, base, n, iinv, iph, ild, oinv, oph, old_,
                      mog_ref, carry):
            pos, wrapd, u_j, nacc, r2p, r2a = carry
            inv0 = iinv[:].reshape(n, n, T)
            ph0 = iph[:]
            ld0 = ild[:]
            ks_np = korb_s[s]
            Rs = R[s]

            def body(row, carry):
                pos, wrapd, inv, ph, ld, u_j, nacc, r2p, r2a = carry
                e = base + row
                emask1 = (
                    jax.lax.broadcasted_iota(jnp.int32, (nelec, 1, 1), 0)
                    == e
                )
                # moved electron's position / RNG rows (masked select)
                epos = jnp.sum(
                    jnp.where(emask1, pos, 0.0), axis=0
                )  # (3, T)
                ex, ey, ez = epos[0], epos[1], epos[2]
                ga = jnp.sum(jnp.where(emask1, gauss, 0.0), axis=0)
                un = jnp.sum(
                    jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, (nelec, 1), 0)
                        == e,
                        unif, 0.0),
                    axis=0,
                )  # (T,)
                invrow = jnp.sum(
                    jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
                        == row,
                        inv, 0.0),
                    axis=1,
                )  # (n, T): inv[:, row]
                mgrow = mog_ref[
                    pl.dslice(row * 4 * n, 4 * n), :
                ].reshape(4, n, T)

                # --- move_begin: drift from the cached value+grad row ----
                r4 = jnp.sum(mgrow * invrow[None, :, :], axis=1)  # (4, T)
                g_old = [r4[1 + ax] / r4[0] for ax in range(3)]
                if jastrow is not None:
                    u_old_e, gj = jastrow_delta(pos, ex, ey, ez, e, s)
                    g_old = [g_old[ax] + gj[ax] for ax in range(3)]
                drift_old = limdrift(g_old)

                # --- propose + supercell fold (enforce_pbc) --------------
                px = ex + ga[0] + tstep * drift_old[0]
                py = ey + ga[1] + tstep * drift_old[1]
                pz = ez + ga[2] + tstep * drift_old[2]
                fx, fy, fz = frac3(px, py, pz, sli)
                wx, wy, wz = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
                nx, ny, nz = frac3(fx - wx, fy - wy, fz - wz, sl)

                # --- move_finish: folded AO->MO value/grad at proposal ---
                xt, ksg = fold_prim(nx, ny, nz, ks_np)
                mo, gmx, gmy, gmz = mo_valgrad(xt, Rs, n, ksg)
                ratio_sl = jnp.sum(mo * invrow, axis=0)  # (T,)
                g_new = [
                    jnp.sum(gm * invrow, axis=0) / ratio_sl
                    for gm in (gmx, gmy, gmz)
                ]
                ratio = ratio_sl
                if jastrow is not None:
                    u_new_e, gj = jastrow_delta(pos, nx, ny, nz, e, s)
                    du = u_new_e - u_old_e
                    ratio = ratio * jnp.exp(du)
                    g_new = [g_new[ax] + gj[ax] for ax in range(3)]
                drift_new = limdrift(g_new)

                # --- Metropolis accept -----------------------------------
                forward = ga[0] * ga[0] + ga[1] * ga[1] + ga[2] * ga[2]
                bx = ga[0] + tstep * (drift_old[0] + drift_new[0])
                by = ga[1] + tstep * (drift_old[1] + drift_new[1])
                bz = ga[2] + tstep * (drift_old[2] + drift_new[2])
                backward = bx * bx + by * by + bz * bz
                t_prob = jnp.exp((forward - backward) / (2.0 * tstep))
                accept_prob = jnp.abs(ratio) ** 2 * t_prob
                if mode == "dmc":
                    accept_prob = jnp.where(ratio <= 0, 0.0, accept_prob)
                accept = accept_prob > un  # (T,)
                accf = accept.astype(dtype)
                nacc = nacc + accf[None, :]
                if mode == "dmc":
                    qx = ga[0] + tstep * drift_old[0]
                    qy = ga[1] + tstep * drift_old[1]
                    qz = ga[2] + tstep * drift_old[2]
                    r2 = qx * qx + qy * qy + qz * qz
                    r2p = r2p + r2[None, :]
                    r2a = r2a + jnp.where(accept, r2, 0.0)[None, :]

                # --- Sherman-Morrison + caches (vectorized over (n, T)) --
                tvec = jnp.sum(mo[:, None, :] * inv, axis=0)  # (n, T)
                rsm = jnp.sum(
                    jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                        == row,
                        tvec, 0.0),
                    axis=0,
                )  # (T,)
                col = invrow  # inv[:, row] (n, T)
                upd = inv - col[:, None, :] * (tvec / rsm)[None, :, :]
                colmask = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1) == row
                )
                newinv = jnp.where(
                    colmask, (col / rsm)[:, None, :], upd
                )
                inv = jnp.where(accept[None, None, :], newinv, inv)
                absr = jnp.abs(rsm)
                safe = jnp.where(absr == 0, 1.0, absr)
                ph = jnp.where(accept[None, :], ph * (rsm / safe)[None, :],
                               ph)
                ld = jnp.where(accept[None, :],
                               ld + jnp.log(safe)[None, :], ld)
                new4 = jnp.stack([mo, gmx, gmy, gmz], axis=0)  # (4, n, T)
                mog_ref[pl.dslice(row * 4 * n, 4 * n), :] = jnp.where(
                    accept[None, :], new4.reshape(4 * n, T),
                    mgrow.reshape(4 * n, T),
                )
                newp = jnp.stack([nx, ny, nz], axis=0)  # (3, T)
                pos = jnp.where(
                    emask1 & accept[None, None, :], newp[None], pos
                )
                wd = jnp.stack([wx, wy, wz], axis=0)
                wrapd = jnp.where(
                    emask1 & accept[None, None, :], wrapd + wd[None], wrapd
                )
                if jastrow is not None:
                    u_j = jnp.where(accept[None, :], u_j + du[None, :], u_j)
                return (pos, wrapd, inv, ph, ld, u_j, nacc, r2p, r2a)

            carry = (pos, wrapd, inv0, ph0, ld0, u_j, nacc, r2p, r2a)
            (pos, wrapd, inv, ph, ld, u_j, nacc, r2p, r2a) = (
                jax.lax.fori_loop(0, n, body, carry)
            )
            # write this spin's inverse/phase/logdet back so the value dies
            # before the other spin's loads
            oinv[:] = inv.reshape(n * n, T)
            oph[:] = ph
            old_[:] = ld
            return pos, wrapd, u_j, nacc, r2p, r2a

        carry = spin_loop(
            0, 0, nup, invur, phur, ldur, oinvu, ophu, oldu, omogu,
            (pos, wrapd, u_j, nacc, r2p, r2a),
        )
        carry = spin_loop(1, nup, ndn, invdr, phdr, lddr, oinvd, ophd, oldd,
                          omogd, carry)
        pos, wrapd, u_fin, nacc, r2p, r2a = carry

        opos[:] = pos.reshape(3 * nelec, T)
        owrapd[:] = wrapd.reshape(3 * nelec, T)
        if jastrow is not None:
            ou[:] = u_fin
        onacc[:] = nacc
        if mode == "dmc":
            or2p[:] = r2p
            or2a[:] = r2a

    row_perm_j = jnp.asarray(row_perm)

    def sweep(params, positions, wrap, state, gauss_step, unif_step):
        """Drop-in for method/vmc.py's periodic sweep: one fused call."""
        nconf = positions.shape[0]
        dtype = positions.dtype
        t = tile or 128
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
        # folded coefficient matrix in the kernel's [group][q][si] row order
        Rfull = orb._folded_coeff(sl_params, dtype)  # (nao_repl, ntot)
        Rk = Rfull[row_perm_j]
        Ru, Rd = Rk[:, :nup], Rk[:, nup:]

        inputs = [padw(x) for x in (pos_t, invu, invd, phu, ldu, phd, ldd,
                                    mogu, mogd, gauss_t, unif_t)] + [Ru, Rd]
        blocked = [3 * nelec, nup * nup, ndn * ndn, 1, 1, 1, 1,
                   nup * 4 * nup, ndn * 4 * ndn, 3 * nelec, nelec]
        in_specs = [
            pl.BlockSpec((r, t), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in blocked
        ]
        in_specs += [
            pl.BlockSpec(Ru.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(Rd.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        if jastrow is not None:
            j_state = state[j_idx]
            j_params = params[f"wf{j_idx}"]
            u_t = padw(j_state.u.reshape(nconf, 1).T)
            ac = j_params["acoeff"]
            bc = j_params["bcoeff"]
            spin_j = jnp.asarray(spin)
            extras = [u_t, ac[:, :, 0], ac[:, :, 1],
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

        out_rows = [3 * nelec, 3 * nelec, nup * nup, ndn * ndn, 1, 1, 1, 1,
                    nup * 4 * nup, ndn * 4 * ndn]
        if jastrow is not None:
            out_rows.append(1)
        out_rows.append(1)  # nacc
        if mode == "dmc":
            out_rows += [1, 1]
        out_shape = [jax.ShapeDtypeStruct((r, Mp), dtype) for r in out_rows]
        out_specs = [
            pl.BlockSpec((r, t), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in out_rows
        ]
        kwargs = {}
        if not interpret:
            # the default scoped-VMEM cap is 16 MB; v5e has 128 MB physical
            # VMEM, and the diamond-supercell state (two 32x32 inverses +
            # two (32,4,32) orbital caches, each present as an input AND an
            # output block, + the replicated-shell AO tiles) peaks at
            # ~21 MB with ref-resident mog caches. NOTE: no
            # input_output_aliases — reading walker state through aliased
            # output refs is only valid for grid=1 (later grid steps get
            # unpopulated revolving output buffers).
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024
            )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            **kwargs,
        )(*inputs)
        outs = [o[:, :nconf] for o in outs]
        (pos_o, wrapd_o, invu_o, invd_o, phu_o, ldu_o, phd_o, ldd_o,
         mogu_o, mogd_o, *rest) = outs
        r2p_o = r2a_o = None
        if mode == "dmc":
            *rest, r2p_o, r2a_o = rest
        if jastrow is not None:
            u_o, nacc = rest
        else:
            (nacc,) = rest

        positions_o = pos_o.T.reshape(nconf, nelec, 3)
        wrap_o = wrap + wrapd_o.T.reshape(nconf, nelec, 3).astype(wrap.dtype)
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
        acc = jnp.mean(nacc)
        if mode == "dmc":
            return positions_o, wrap_o, new_state, (
                acc, r2p_o.reshape(nconf), r2a_o.reshape(nconf)
            )
        return positions_o, wrap_o, new_state, acc

    return sweep
