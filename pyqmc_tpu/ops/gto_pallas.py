"""Pallas TPU kernel: fused GTO value/gradient/laplacian evaluation.

Hand-fused counterpart of ops/gto.eval_gto (mode=2). Layout is chosen for
the VPU: all intermediates are 2D (shells-on-sublanes, points-on-lanes), so
a tile of T points occupies full 128-lane registers; radial contractions,
monomials, solid-harmonic projection and derivative assembly happen in one
kernel with zero HBM round-trips. Outputs are produced transposed
((nao, M) etc.) and flipped back in the wrapper.

Numerics match ops/gto.eval_gto to fp eps (tests/unit/test_gto_pallas.py).
For the small benchmark molecules the XLA path is already fusion-friendly;
this kernel targets larger bases/point batches.
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


def build_pallas_evaluator(spec: GTOSpec, tile: int = 512, interpret: bool = False):
    """Returns f(X (M,3)) -> (ao (M,nao), grad (M,3,nao), lap (M,nao)).

    M must be a multiple of `tile` (pad at the call site).
    """
    nao = spec.nao
    groups = []
    for g in spec.groups:
        centers = spec.atom_coords[np.asarray(g.shell_atoms)]
        C = cart2sph_matrix(g.l)
        comps = cart_components(g.l)
        cols = np.array(g.ao_pos).reshape(len(g.shell_atoms), 2 * g.l + 1)
        groups.append(
            (g.l, centers, np.asarray(g.alpha), np.asarray(g.coef), C, comps, cols)
        )

    def kernel(xt_ref, *refs):
        # xt_ref: (3, T); tables per group follow; outputs last
        ntab = 3 * len(groups)
        table_refs = refs[:ntab]
        ao_ref, gr_ref, lp_ref = refs[ntab:]
        xt = xt_ref[:]  # (3, T)
        for gi, (l, centers_np, alpha_np, coef_np, C_np, comps, cols) in enumerate(
            groups
        ):
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
            g2 = jnp.zeros_like(r2)
            for p in range(P):
                a_p = alpha[:, p][:, None]
                c_p = coef[:, p][:, None]
                e = c_p * jnp.exp(-a_p * r2)
                g0 = g0 + e
                g1 = g1 + a_p * e
                g2 = g2 + a_p * a_p * e
            # power tables (each (S, T))
            one = jnp.ones_like(rx)
            pw = {
                0: [one, rx], 1: [one, ry], 2: [one, rz]
            }
            for k in range(2, l + 1):
                pw[0].append(pw[0][-1] * rx)
                pw[1].append(pw[1][-1] * ry)
                pw[2].append(pw[2][-1] * rz)

            def mono(i, j, k):
                return pw[0][i] * pw[1][j] * pw[2][k]

            P_c = [mono(i, j, k) for (i, j, k) in comps]
            dP = [[], [], []]
            lapP_c = []
            for (i, j, k) in comps:
                for ax, n in enumerate((i, j, k)):
                    if n == 0:
                        dP[ax].append(None)
                    else:
                        e2 = [i, j, k]
                        e2[ax] -= 1
                        dP[ax].append(n * mono(*e2))
                acc = None
                for ax, n in enumerate((i, j, k)):
                    if n >= 2:
                        e2 = [i, j, k]
                        e2[ax] -= 2
                        term = n * (n - 1) * mono(*e2)
                        acc = term if acc is None else acc + term
                lapP_c.append(acc)
            rvec = (rx, ry, rz)
            nsph = 2 * l + 1
            C_np_ = C_np  # (ncart, nsph)
            for q in range(nsph):
                val = None
                lap = None
                gcart = [None, None, None]
                for c, (i, j, k) in enumerate(comps):
                    w = float(C_np_[c, q])
                    if w == 0.0:
                        continue
                    vterm = P_c[c] * g0
                    val = w * vterm if val is None else val + w * vterm
                    lterm = (
                        -(4.0 * l + 6.0) * P_c[c] * g1
                        + 4.0 * P_c[c] * g2 * r2
                    )
                    if lapP_c[c] is not None:
                        lterm = lterm + lapP_c[c] * g0
                    lap = w * lterm if lap is None else lap + w * lterm
                    for ax in range(3):
                        gterm = -2.0 * rvec[ax] * P_c[c] * g1
                        if dP[ax][c] is not None:
                            gterm = gterm + dP[ax][c] * g0
                        gcart[ax] = (
                            w * gterm if gcart[ax] is None else gcart[ax] + w * gterm
                        )
                # write rows (per shell, static)
                for si in range(S):
                    row = int(cols[si][q])
                    ao_ref[row, :] = val[si]
                    lp_ref[row, :] = lap[si]
                    for ax in range(3):
                        gr_ref[ax * nao + row, :] = gcart[ax][si]

    def evaluate(X):
        M = X.shape[0]
        assert M % tile == 0, f"pad M={M} to a multiple of {tile}"
        grid = (M // tile,)
        Xt = X.T  # (3, M)
        table_inputs = []
        table_specs = []
        for (l, centers, alpha, coef, C, comps, cols) in groups:
            for arr in (centers, alpha, coef):
                a = jnp.asarray(arr, X.dtype)
                table_inputs.append(a)
                table_specs.append(
                    pl.BlockSpec(
                        a.shape,
                        functools.partial(lambda nd, i: (0,) * nd, a.ndim),
                        memory_space=pltpu.VMEM,
                    )
                )
        ao_t, gr_t, lp_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ]
            + table_specs,
            out_specs=[
                pl.BlockSpec((nao, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * nao, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nao, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nao, M), X.dtype),
                jax.ShapeDtypeStruct((3 * nao, M), X.dtype),
                jax.ShapeDtypeStruct((nao, M), X.dtype),
            ],
            interpret=interpret,
        )(Xt, *table_inputs)
        ao = ao_t.T
        grad = gr_t.reshape(3, nao, M).transpose(2, 0, 1)
        lap = lp_t.T
        return ao, grad, lap

    return evaluate


def build_pallas_value_mo(spec: GTOSpec, norb_tot: int, tile: int = 512,
                          interpret: bool = False):
    """Fused value-only GTO + MO contraction: f(Xt (3, M), C_r (nao, norb))
    -> mo (norb, M).

    C_r must be in CONCATENATED shell-row order (mo_coeff rows permuted by
    spec.perm's inverse — i.e. C_r = C[row_order] where row_order is the
    concat order). The kernel evaluates every AO into VMEM registers,
    assembles the (nao, T) tile, and contracts against C_r on the spot —
    the (M, S, P) radial intermediates that the XLA path materializes in
    HBM (the measured bottleneck of the ECP quadrature sweep: ~100 MB of
    traffic per step at 98k aux points) never leave VMEM.
    """
    nao = spec.nao
    groups = []
    for g in spec.groups:
        centers = spec.atom_coords[np.asarray(g.shell_atoms)]
        C = cart2sph_matrix(g.l)
        comps = cart_components(g.l)
        cols = np.array(g.ao_pos).reshape(len(g.shell_atoms), 2 * g.l + 1)
        groups.append(
            (g.l, centers, np.asarray(g.alpha), np.asarray(g.coef), C, comps, cols)
        )

    def kernel(xt_ref, cr_ref, *refs):
        ntab = 3 * len(groups)
        table_refs = refs[:ntab]
        mo_ref = refs[ntab]
        xt = xt_ref[:]  # (3, T)
        rows = [None] * nao
        rowi = 0
        for gi, (l, centers_np, alpha_np, coef_np, C_np, comps, cols) in enumerate(
            groups
        ):
            cen = table_refs[3 * gi][:]  # (S, 3)
            alpha = table_refs[3 * gi + 1][:]  # (S, P)
            coef = table_refs[3 * gi + 2][:]  # (S, P)
            S, P = alpha_np.shape
            rx = xt[0][None, :] - cen[:, 0][:, None]  # (S, T)
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
            # concat row order is shell-major, sph-minor (eval_gto reshapes
            # (M, S, nsph) -> (M, S*nsph))
            sph = []
            for q in range(nsph):
                val = None
                for c in range(len(comps)):
                    w = float(C_np[c, q])
                    if w == 0.0:
                        continue
                    val = w * P_c[c] if val is None else val + w * P_c[c]
                sph.append(val)
            for si in range(S):
                for q in range(nsph):
                    rows[rowi] = sph[q][si]
                    rowi += 1
        ao_mat = jnp.stack(rows, axis=0)  # (nao, T), concat row order
        mo_ref[:, :] = jnp.dot(
            cr_ref[:].T, ao_mat, preferred_element_type=ao_mat.dtype
        )

    def evaluate(Xt, C_r):
        M = Xt.shape[1]
        assert M % tile == 0
        grid = (M // tile,)
        table_inputs = []
        table_specs = []
        for (l, centers, alpha, coef, C, comps, cols) in groups:
            for arr in (centers, alpha, coef):
                a = jnp.asarray(arr, Xt.dtype)
                table_inputs.append(a)
                table_specs.append(
                    pl.BlockSpec(
                        a.shape,
                        functools.partial(lambda nd, i: (0,) * nd, a.ndim),
                        memory_space=pltpu.VMEM,
                    )
                )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (nao, norb_tot), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ]
            + table_specs,
            out_specs=pl.BlockSpec(
                (norb_tot, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((norb_tot, M), Xt.dtype),
            interpret=interpret,
        )(Xt, C_r, *table_inputs)

    return evaluate


def fused_value_mo_t(spec: GTOSpec, norb_tot: int, tile: int = None,
                     interpret: bool = False):
    """Like fused_value_mo but returns the kernel-native TRANSPOSED layout:
    f(X (M, 3), C_r) -> mo_t (norb_tot, M), points on lanes.

    Callers that can consume points-minor (the single-determinant ECP
    ratio contraction) avoid the (norb, M) -> (..., norb) transpose that
    profiling showed costs ~3x the kernel itself at 98k-point ECP sweeps
    (physical relayout copies at ~8% of HBM peak)."""
    if tile is None:
        tile = max(512, min(4096, (262144 // max(spec.nao, 1)) // 512 * 512))
    ev = build_pallas_value_mo(spec, norb_tot, tile=tile, interpret=interpret)

    def f(X, C_r):
        M = X.shape[0]
        Mp = ((M + tile - 1) // tile) * tile
        Xf = X
        if Mp != M:
            Xf = jnp.concatenate([Xf, jnp.zeros((Mp - M, 3), X.dtype)], axis=0)
        mo_t = ev(Xf.T, C_r)  # (norb, Mp)
        return mo_t[:, :M]

    return f


def fused_value_mo(spec: GTOSpec, norb_tot: int, tile: int = None,
                   interpret: bool = False):
    """mode=0 orbital evaluation drop-in: f(X (..., 3), C_r (nao, norb_tot))
    -> mo (..., norb_tot), with C_r in concat shell-row order (permute the
    AO-ordered mo_coeff rows with the concat order = argsort(spec.perm)
    inverse, i.e. C_r = C[concat_rows]).

    tile=None picks the largest VMEM-safe tile: measured on v5e at 98k
    points / 24 AOs, the kernel nets 34 us at tile=4096 vs 74 us at 512
    (XLA path: 128 us) — wide tiles keep the VPU's 8x128 lanes full."""
    if tile is None:
        # ~4 live (nao, tile) f32 buffers; budget ~4 MB of VMEM for them
        tile = max(512, min(4096, (262144 // max(spec.nao, 1)) // 512 * 512))
    ev = build_pallas_value_mo(spec, norb_tot, tile=tile, interpret=interpret)

    def f(X, C_r):
        shape = X.shape[:-1]
        M = int(np.prod(shape)) if shape else 1
        Xf = X.reshape(-1, 3)
        Mp = ((M + tile - 1) // tile) * tile
        if Mp != M:
            Xf = jnp.concatenate([Xf, jnp.zeros((Mp - M, 3), X.dtype)], axis=0)
        mo_t = ev(Xf.T, C_r)  # (norb, Mp)
        return mo_t.T[:M].reshape(shape + (norb_tot,))

    return f


def fused_eval_gto2(spec: GTOSpec, tile: int = 512, interpret: bool = False):
    """mode=2 eval_gto drop-in built on the fused kernel.

    Returns f(X (..., 3)) -> (ao (..., nao), grad (..., 3, nao),
    lap (..., nao)); flattens leading dims and pads the point count to a
    tile multiple. Measured on TPU v5e (tools/pallas_gto_bench.py,
    dispatch-amortized): 1.04x vs XLA at 23 AOs, 1.09x at 184, 1.82x at
    552 — the win grows with basis size because the fused kernel keeps
    the power/harmonic tables in registers instead of re-reading HBM.
    """
    ev = build_pallas_evaluator(spec, tile=tile, interpret=interpret)
    nao = spec.nao

    def f(X):
        shape = X.shape[:-1]
        M = int(np.prod(shape)) if shape else 1
        Xf = X.reshape(-1, 3)
        Mp = ((M + tile - 1) // tile) * tile
        if Mp != M:
            Xf = jnp.concatenate(
                [Xf, jnp.zeros((Mp - M, 3), X.dtype)], axis=0
            )
        ao, gr, lp = ev(Xf)
        return (
            ao[:M].reshape(shape + (nao,)),
            gr[:M].reshape(shape + (3, nao)),
            lp[:M].reshape(shape + (nao,)),
        )

    return f
