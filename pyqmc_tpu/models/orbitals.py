"""Orbital evaluators: molecular and periodic k-point.

Counterpart of pyqmc/wf/orbitals.py (MoleculeOrbitalEvaluator :54-100,
PBCOrbitalEvaluatorKpoints :118-255), redesigned for XLA:

  * molecular: AO batch (one fused GTO kernel) -> one MXU matmul per spin;
  * periodic: AOs are evaluated per lattice image with shifted centers and
    contracted against the (nimg, nk) Bloch phase matrix in a single complex
    einsum (an MXU matmul), instead of the reference's per-image numba loops
    (wf/numba/pbcgto.py:594-653);
  * wrap phases: instead of threading integer wrap counters through the
    whole sampler (coord.py:45-52, orbitals.py:204-213), the evaluator folds
    raw positions into the cell internally and applies e^{i k.(w A)} on the
    fly. Samplers may keep walker positions unfolded within a block; they
    refold at block boundaries where the state is recomputed anyway.

The evaluator owns the mo_coeff parameter layout; Slater is generic over it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.gto import GTOSpec, eval_gto


class MolecularOrbitals:
    """Open-boundary orbitals: mo = ao @ C per spin.

    fused: use the Pallas fused value/grad/lap kernel (ops/gto_pallas.py)
    for mode-2 evaluations. "auto" enables it on TPU backends for bases
    of >= 128 AOs, where it is measured faster than the XLA path
    (tools/pallas_gto_bench.py: 1.8x at 552 AOs, parity below ~200).
    """

    _FUSED_MIN_NAO = 128

    def __init__(self, mol, mo_coeff: Tuple[np.ndarray, np.ndarray],
                 fused="auto"):
        self.spec = GTOSpec.from_molecule(mol)
        self._ca = np.asarray(mo_coeff[0])
        self._cb = np.asarray(mo_coeff[1])
        self.norb = (self._ca.shape[1], self._cb.shape[1])
        backend = jax.devices()[0].platform
        on_tpu = backend not in ("cpu", "gpu")
        if fused == "auto":
            fused = on_tpu and self.spec.nao >= self._FUSED_MIN_NAO
        self._fused2 = None
        if fused:
            from ..ops.gto_pallas import fused_eval_gto2

            self._fused2 = fused_eval_gto2(self.spec)
        # value-only path (ECP quadrature, OBDM aux sampling): the fused
        # GTO+MO kernel wins at EVERY basis size on TPU — the XLA path's
        # (M, S, P) radial intermediates are pure HBM traffic the kernel
        # keeps in VMEM (measured: the H2O ECP sweep's AO eval drops
        # 113 us -> ~15 us per step at 98k aux points)
        self._fused0 = None
        self._fused0_t = None
        if on_tpu:
            from ..ops.gto_pallas import fused_value_mo, fused_value_mo_t

            self._fused0 = fused_value_mo(
                self.spec, self._ca.shape[1] + self._cb.shape[1]
            )
            self._fused0_t = fused_value_mo_t(
                self.spec, self._ca.shape[1] + self._cb.shape[1]
            )
            # concat shell-row order: row j of the kernel's AO tile is AO
            # index concat_rows[j] (= argsort of the spec's perm gather)
            self._concat_rows = np.argsort(self.spec.perm)

    def make_params(self):
        return {
            "mo_coeff_alpha": jnp.asarray(self._ca),
            "mo_coeff_beta": jnp.asarray(self._cb),
        }

    def eval_mo_t(self, params, X):
        """Transposed value-only MOs: X (M, 3) -> (norb_up + norb_dn, M),
        points on the minor axis (the fused kernel's native layout — no
        relayout transpose; see ops/gto_pallas.fused_value_mo_t). Falls
        back to an explicit transpose of the XLA path off-TPU."""
        ca, cb = params["mo_coeff_alpha"], params["mo_coeff_beta"]
        if self._fused0_t is not None and X.dtype == jnp.float32:
            cr = jnp.concatenate([ca, cb], axis=1)[self._concat_rows]
            return self._fused0_t(X, cr.astype(X.dtype))
        ao = eval_gto(self.spec, X, 0)
        return (ao @ jnp.concatenate([ca, cb], axis=1)).T

    def eval(self, params, X, mode: int):
        """X (..., 3) -> per-spin MO arrays.

        mode 0: (mo_up, mo_dn); mode 1: adds (gmo_up, gmo_dn) with a leading
        3-axis before the orbital axis; mode 2: adds laplacian MOs.
        """
        ca, cb = params["mo_coeff_alpha"], params["mo_coeff_beta"]
        if mode == 0:
            if self._fused0 is not None and X.dtype == jnp.float32:
                cr = jnp.concatenate([ca, cb], axis=1)[self._concat_rows]
                mo = self._fused0(X, cr.astype(X.dtype))
                na = ca.shape[1]
                return (mo[..., :na], mo[..., na:])
            ao = eval_gto(self.spec, X, 0)
            return (ao @ ca, ao @ cb)
        if mode == 1:
            ao, aog = eval_gto(self.spec, X, 1)
            return (ao @ ca, ao @ cb, aog @ ca, aog @ cb)
        if self._fused2 is not None and X.dtype == jnp.float32:
            ao, aog, aol = self._fused2(X)
        else:
            ao, aog, aol = eval_gto(self.spec, X, 2)
        return (ao @ ca, ao @ cb, aog @ ca, aog @ cb, aol @ ca, aol @ cb)


def select_pbc_images(lattice, shells, atom_coords, tol=1e-6, ngrid=6):
    """Static lattice image set for the AO sum.

    Keep image L iff some atom translated by L has a basis function reaching
    into the home cell: min distance from R_a + L to the cell region < rcut,
    with rcut from the most diffuse exponent (orbitals.py:258-278). The cell
    region is sampled on an ngrid^3 fractional grid (margin = sample
    diagonal), correct for arbitrary (skewed) lattices.
    """
    amin = min(float(np.min(s.exps)) for s in shells)
    rcut = np.sqrt(-np.log(tol) / amin)
    fr = (np.arange(ngrid) + 0.5) / ngrid
    grid = (
        np.array(np.meshgrid(fr, fr, fr, indexing="ij")).reshape(3, -1).T @ lattice
    )
    margin = 0.5 * np.linalg.norm(lattice.sum(axis=0)) / ngrid
    inv = np.linalg.inv(lattice)
    heights = 1.0 / np.linalg.norm(inv, axis=0)
    diam = np.linalg.norm(lattice.sum(axis=0))
    nimg = np.maximum(1, np.ceil((rcut + diam) / heights).astype(int))
    rngs = [np.arange(-n, n + 1) for n in nimg]
    pts = np.array(np.meshgrid(*rngs, indexing="ij")).reshape(3, -1).T
    imgs = pts @ lattice
    atoms = np.asarray(atom_coords)
    # (nimg, natom, ngrid^3) distances
    d = np.linalg.norm(
        imgs[:, None, None, :] + atoms[None, :, None, :] - grid[None, None, :, :],
        axis=-1,
    )
    keep = d.min(axis=(1, 2)) <= rcut + margin
    return imgs[keep]


class KPointOrbitals:
    """Periodic k-point orbitals.

    mo_coeff: per spin, a list over k-points of (nao, nocc_k) complex
    arrays (only the orbitals used by the wavefunction). The flattened
    orbital order is k-major: [k0 orb0, k0 orb1, ..., k1 orb0, ...]
    (param_split semantics of orbitals.py:221-239).
    """

    def __init__(self, cell, kpts, mo_coeff, images=None, img_tol=1e-6,
                 realify="auto"):
        """realify: at time-reversal-invariant k (k = -k mod G, e.g. gamma
        and half-integer Monkhorst-Pack points) all Bloch phases are +-1 and
        each orbital can be rotated to a real vector; the whole evaluator
        then runs in real arithmetic (required on TPU backends without
        complex support; also ~2x cheaper). "auto" realifies when every k is
        TRIM and the rotation residual is < 1e-6.
        """
        self.spec = GTOSpec.from_molecule(cell)
        self.lattice = np.asarray(cell.lattice, dtype=np.float64)
        self.lattice_inv = np.linalg.inv(self.lattice)
        self.kpts = np.asarray(kpts, dtype=np.float64).reshape(-1, 3)
        self.images = (
            np.asarray(images)
            if images is not None
            else select_pbc_images(
                self.lattice, cell.shells, cell.atom_coords, img_tol
            )
        )
        self._mo = []
        for spin in range(2):
            blocks = [np.asarray(c) for c in mo_coeff[spin]]
            self._mo.append(blocks)

        # TRIM detection: k.a_i in {0, pi} mod 2pi for every lattice vector
        ka = self.kpts @ self.lattice.T  # (nk, 3)
        frac2 = ka / np.pi
        is_trim = np.all(np.abs(frac2 - np.round(frac2)) < 1e-8)
        self.real_mode = False
        if realify in (True, "auto") and is_trim:
            rotated, ok = self._try_realify()
            if ok:
                self._mo = rotated
                self.real_mode = True
            elif realify is True:
                raise ValueError("realify requested but orbitals are not "
                                 "phase-rotatable to real vectors")

        # phases e^{i k.L}: (nimg, nk); exactly +-1 in real mode
        ph = np.exp(1j * self.images @ self.kpts.T)
        self.img_phases = np.real(ph) if self.real_mode else ph
        self.norb = tuple(
            sum(b.shape[1] for b in self._mo[s]) for s in range(2)
        )
        self.nk = len(self.kpts)
        # real-mode fast path: one replicated-shell evaluation with
        # per-(shell, image) culling + a single phase matmul, instead of a
        # loop of full-basis evaluations per image (the per-shell cutoff the
        # reference implements inside its numba kernels, pbcgto.py:524-592)
        # the replicated-shell spec + folded coefficients also serve the
        # general-twist real-pair path (_eval_pair_folded): the 47-image
        # GTO loop in _kaos_pair was ~3x the TRIM cost on diamond-C
        self._repl = None
        self._repl_spec = None
        self._build_replicated(cell, img_tol)

    def _build_replicated(self, cell, tol):
        import dataclasses as _dc

        lat = self.lattice
        ngrid = 6
        fr = (np.arange(ngrid) + 0.5) / ngrid
        grid = (
            np.array(np.meshgrid(fr, fr, fr, indexing="ij")).reshape(3, -1).T @ lat
        )
        margin = 0.5 * np.linalg.norm(lat.sum(axis=0)) / ngrid
        centers = []
        repl = []
        phase_rows = []  # (row block -> (orig shell, image idx))
        ao_idx_rows = []  # repl row -> original AO index
        phase_per_row = []  # repl row -> (nk,) image phase
        nao = cell.nao
        off = 0
        for L, ph in zip(self.images, self.img_phases):
            for sh in cell.shells:
                c = cell.atom_coords[sh.atom] + L
                rcut = np.sqrt(-np.log(tol) / float(np.min(sh.exps)))
                if np.min(np.linalg.norm(grid - c[None], axis=1)) > rcut + margin:
                    continue
                repl.append(
                    _dc.replace(sh, atom=len(centers), ao_offset=off)
                )
                centers.append(c)
                phase_rows.append((sh, ph))
                nsph = 2 * sh.l + 1
                ao_idx_rows.extend(range(sh.ao_offset, sh.ao_offset + nsph))
                phase_per_row.extend([ph] * nsph)
                off += nsph
        self._repl_spec = GTOSpec.from_shells(repl, np.asarray(centers), off)
        # folded-coefficient path (real/TRIM mode): instead of materializing
        # k-AOs via the sparse phase matmul P (nao_repl, nk*nao) and then
        # applying per-k MO blocks, fold both into ONE real matrix
        # R (nao_repl, norb_tot): R rows replicate the k-blocks' MO rows
        # scaled by their image phase, so  mo = (AO_repl @ R) * wrapphase —
        # the periodic evaluation becomes structurally identical to the
        # molecular ao @ C and can ride the fused Pallas GTO+MO kernel
        # (no (npts, nk*nao) k-AO intermediate in HBM, one MXU matmul
        # instead of nk small ones). pgradient keeps the k-AO path
        # (_kaos_replicated) — it needs per-k AOs for d(det)/d(mo_coeff).
        self._repl_ao_idx = np.asarray(ao_idx_rows, dtype=np.int32)
        self._repl_phase_c = np.asarray(phase_per_row)  # (nao_repl, nk) cplx
        self._repl_phase = np.real(self._repl_phase_c)
        self._korb = np.concatenate([
            np.concatenate([
                np.full(b.shape[1], k, dtype=np.int32)
                for k, b in enumerate(self._mo[s])
            ]) for s in range(2)
        ])  # orbital column -> k index, both spins concatenated
        self._repl_fused0 = None
        self._repl_fused0_t = None
        self._repl_fused0_pair = None
        if jax.devices()[0].platform not in ("cpu", "gpu"):
            from ..ops.gto_pallas import fused_value_mo, fused_value_mo_t

            ntot = self.norb[0] + self.norb[1]
            self._repl_concat_rows = np.argsort(self._repl_spec.perm)
            if self.real_mode:
                self._repl_fused0 = fused_value_mo(self._repl_spec, ntot)
                self._repl_fused0_t = fused_value_mo_t(self._repl_spec, ntot)
            else:
                # pair path: one fused pass over [R_re | R_im] columns
                self._repl_fused0_pair = fused_value_mo(
                    self._repl_spec, 2 * ntot
                )
        if self.real_mode:
            # single-det ECP fast path discovers the transposed evaluator
            # by hasattr, so only real-mode instances expose it
            self.eval_mo_t = self._eval_mo_t_folded
        # replicated-shell tables are large (every kept (shell, image) pair
        # is its own shell), which is where the fused Pallas kernel wins
        # (tools/pallas_gto_bench.py: 1.8x at 552 AOs); auto-enable for
        # mode-2 sweeps on TPU backends
        self._repl_fused2 = None
        if (jax.devices()[0].platform not in ("cpu", "gpu")
                and off >= MolecularOrbitals._FUSED_MIN_NAO):
            from ..ops.gto_pallas import fused_eval_gto2

            self._repl_fused2 = fused_eval_gto2(self._repl_spec)
        self._repl_nao = nao
        # P: (nao_repl, nk * nao); real (+-1 phases) in real mode, complex
        # otherwise — the complex _kaos route uses the same culled row set
        # as the folded pair path, so the two stay bit-comparable
        P = np.zeros((off, self.nk * nao),
                     dtype=np.float64 if self.real_mode else np.complex128)
        row = 0
        for sh, ph in phase_rows:
            nsph = 2 * sh.l + 1
            for k in range(self.nk):
                pk = np.real(ph[k]) if self.real_mode else ph[k]
                P[row : row + nsph,
                  k * nao + sh.ao_offset : k * nao + sh.ao_offset + nsph] = (
                    pk * np.eye(nsph)
                )
            row += nsph
        self._repl = P

    def _try_realify(self, tol=1e-6):
        out = []
        for spin in range(2):
            blocks = []
            for c in self._mo[spin]:
                c = np.asarray(c, dtype=np.complex128)
                cols = []
                for j in range(c.shape[1]):
                    v = c[:, j]
                    theta = 0.5 * np.angle(np.sum(v * v))
                    r = v * np.exp(-1j * theta)
                    if np.max(np.abs(r.imag)) > tol * max(
                        1.0, np.max(np.abs(r.real))
                    ):
                        return None, False
                    cols.append(r.real)
                blocks.append(np.stack(cols, axis=1))
            out.append(blocks)
        return out, True

    def make_params(self):
        return {
            "mo_coeff_alpha": [jnp.asarray(b) for b in self._mo[0]],
            "mo_coeff_beta": [jnp.asarray(b) for b in self._mo[1]],
        }

    def _fold(self, X):
        """Fold raw positions; returns (Xfold, wrapphase (..., nk)).

        Wrap phase is e^{i k.(w A)} (complex), or cos(k.(w A)) = +-1 exactly
        in real (TRIM) mode.
        """
        frac = X @ jnp.asarray(self.lattice_inv, X.dtype)
        wrap = jnp.floor(frac)
        Xf = (frac - wrap) @ jnp.asarray(self.lattice, X.dtype)
        wrapcart = wrap @ jnp.asarray(self.lattice, X.dtype)
        karg = wrapcart @ jnp.asarray(self.kpts.T, X.dtype)
        if self.real_mode:
            # k.(wA) = pi * integer at TRIM points: round to exact +-1
            return Xf, jnp.where(jnp.cos(karg) > 0, 1.0, -1.0).astype(X.dtype)
        return Xf, jnp.exp(1j * karg)

    def _kaos(self, X, mode: int):
        """Complex k-AOs phi^k_mu at folded X: returns tuple of arrays
        (..., nk, nao) [, (..., 3, nk, nao), (..., nk, nao)]."""
        if self._repl is not None:
            return self._kaos_replicated(X, mode)
        Xf, wphase = self._fold(X)
        per_img = []
        for L in self.images:
            # chi_mu(r - R_mu - L): centers shifted by +L
            per_img.append(eval_gto(self.spec, Xf, mode, shift=jnp.asarray(L, X.dtype)))
        ph = jnp.asarray(self.img_phases)  # (nimg, nk)
        if mode == 0:
            stack = jnp.stack(per_img, axis=-2)  # (..., nimg, nao)
            ao_k = jnp.einsum("...ia,ik->...ka", stack, ph)
            return (ao_k * wphase[..., :, None],)
        vals = jnp.stack([p[0] for p in per_img], axis=-2)
        grads = jnp.stack([p[1] for p in per_img], axis=-3)  # (..., nimg?, 3, nao)? see below
        ao_k = jnp.einsum("...ia,ik->...ka", vals, ph) * wphase[..., :, None]
        g_k = jnp.einsum("...ixa,ik->...xka", grads, ph) * wphase[..., None, :, None]
        if mode == 1:
            return ao_k, g_k
        laps = jnp.stack([p[2] for p in per_img], axis=-2)
        l_k = jnp.einsum("...ia,ik->...ka", laps, ph) * wphase[..., :, None]
        return ao_k, g_k, l_k

    def _kaos_replicated(self, X, mode: int):
        """Culled replicated-shell eval + phase matmul (both modes; the
        phase matrix P is +-1 real in real mode, complex otherwise)."""
        Xf, wphase = self._fold(X)  # real (+-1) or complex e^{ik.wA}
        if self.real_mode:
            P = jnp.asarray(self._repl, X.dtype)  # (nao_repl, nk*nao)
        else:
            P = jnp.asarray(
                self._repl,
                jnp.complex64 if X.dtype == jnp.float32 else jnp.complex128,
            )
        nao = self._repl_nao
        if (mode == 2 and self._repl_fused2 is not None
                and X.dtype == jnp.float32):
            out = self._repl_fused2(Xf)
        else:
            out = eval_gto(self._repl_spec, Xf, mode)
        if mode == 0:
            out = (out,)
        res = []
        for slot, arr in enumerate(out):
            shp = arr.shape[:-1]
            ao_k = (arr @ P).reshape(shp + (self.nk, nao))
            if slot == 1 and mode >= 1:
                res.append(ao_k * wphase[..., None, :, None])
            else:
                res.append(ao_k * wphase[..., :, None])
        return tuple(res)

    def _mos_from_kaos(self, params, ao_k, spin):
        """(..., nk, nao) -> (..., norb_s) concatenated over k."""
        blocks = params["mo_coeff_alpha" if spin == 0 else "mo_coeff_beta"]
        outs = [
            ao_k[..., k, :] @ blocks[k] for k in range(self.nk)
        ]
        return jnp.concatenate(outs, axis=-1)

    def _folded_coeff(self, params, dtype):
        """R (nao_repl, norb_up + norb_dn): per replicated row r (original
        AO a, image L), R[r, (s,k,j)] = Re(e^{ikL}) C^s_k[a, j] — cheap
        gathers, rebuilt per call so optimized mo_coeff flow through."""
        idx = jnp.asarray(self._repl_ao_idx)
        ph = jnp.asarray(self._repl_phase, dtype)
        cols = []
        for tag in ("alpha", "beta"):
            for k, b in enumerate(params[f"mo_coeff_{tag}"]):
                cols.append(b.astype(dtype)[idx] * ph[:, k][:, None])
        return jnp.concatenate(cols, axis=1)

    def _eval_folded(self, params, X, mode: int):
        """Real-mode evaluation via the folded coefficient matrix: one
        replicated-shell GTO pass + one (nao_repl, norb_tot) contraction
        (+- the wrap phase per orbital column). Numerically identical to
        the k-AO route: mo_k = (AO@P)_k w_k C_k = w_k (AO @ (P_k C_k))."""
        Xf, wphase = self._fold(X)  # wphase (..., nk) of +-1
        R = self._folded_coeff(params, X.dtype)
        wcol = wphase[..., jnp.asarray(self._korb)]  # (..., norb_tot)
        nu = self.norb[0]

        def split(m):
            return m[..., :nu], m[..., nu:]

        if mode == 0:
            if self._repl_fused0 is not None and X.dtype == jnp.float32:
                mo = self._repl_fused0(Xf, R[self._repl_concat_rows])
            else:
                mo = eval_gto(self._repl_spec, Xf, 0) @ R
            return split(mo * wcol)
        if mode == 1:
            ao, aog = eval_gto(self._repl_spec, Xf, 1)
            mo = (ao @ R) * wcol
            gmo = (aog @ R) * wcol[..., None, :]
            return split(mo) + split(gmo)
        if self._repl_fused2 is not None and X.dtype == jnp.float32:
            ao, aog, aol = self._repl_fused2(Xf)
        else:
            ao, aog, aol = eval_gto(self._repl_spec, Xf, 2)
        mo = (ao @ R) * wcol
        gmo = (aog @ R) * wcol[..., None, :]
        lmo = (aol @ R) * wcol
        return split(mo) + split(gmo) + split(lmo)

    def _eval_mo_t_folded(self, params, X):
        """Transposed value-only MOs (norb_tot, M) in the fused kernel's
        native points-minor layout (MolecularOrbitals.eval_mo_t contract);
        bound as `eval_mo_t` only on real-mode instances."""
        Xf, wphase = self._fold(X)  # X (M, 3), wphase (M, nk)
        R = self._folded_coeff(params, X.dtype)
        wcol_t = wphase[:, jnp.asarray(self._korb)].T  # (norb_tot, M)
        if self._repl_fused0_t is not None and X.dtype == jnp.float32:
            return self._repl_fused0_t(Xf, R[self._repl_concat_rows]) * wcol_t
        return (eval_gto(self._repl_spec, Xf, 0) @ R).T * wcol_t

    # --- real-pair path (for TPU backends without complex support) -------
    def make_pair_params(self):
        """Parameters with complex mo_coeff split into re/im real arrays."""
        return {
            "mo_coeff_alpha_re": [jnp.asarray(np.real(b)) for b in self._mo[0]],
            "mo_coeff_alpha_im": [jnp.asarray(np.imag(b)) for b in self._mo[0]],
            "mo_coeff_beta_re": [jnp.asarray(np.real(b)) for b in self._mo[1]],
            "mo_coeff_beta_im": [jnp.asarray(np.imag(b)) for b in self._mo[1]],
        }

    def _kaos_pair(self, X, mode: int):
        """k-AOs as (re, im) real arrays — no complex ops anywhere.

        Returns a list over derivative slots of ((..., nk, nao) re, im).
        """
        if self._repl is not None:
            return self._kaos_pair_replicated(X, mode)
        Xf, _ = self._fold(X)
        frac = X @ jnp.asarray(self.lattice_inv, X.dtype)
        wrapcart = jnp.floor(frac) @ jnp.asarray(self.lattice, X.dtype)
        karg = wrapcart @ jnp.asarray(self.kpts.T, X.dtype)
        cw, sw = jnp.cos(karg), jnp.sin(karg)  # (..., nk)
        per_img = [eval_gto(self.spec, Xf, mode, shift=jnp.asarray(L, X.dtype))
                   for L in self.images]
        cosp = jnp.asarray(np.cos(self.images @ self.kpts.T), X.dtype)
        sinp = jnp.asarray(np.sin(self.images @ self.kpts.T), X.dtype)
        outs = []
        nslots = 1 if mode == 0 else (2 if mode == 1 else 3)
        for slot in range(nslots):
            arrs = [p if mode == 0 else p[slot] for p in per_img]
            if slot == 1 and mode >= 1:
                stack = jnp.stack(arrs, axis=-3)  # (..., nimg, 3, nao)
                re = jnp.einsum("...ixa,ik->...xka", stack, cosp)
                im = jnp.einsum("...ixa,ik->...xka", stack, sinp)
                wre = cw[..., None, :, None]
                wim = sw[..., None, :, None]
            else:
                stack = jnp.stack(arrs, axis=-2)  # (..., nimg, nao)
                re = jnp.einsum("...ia,ik->...ka", stack, cosp)
                im = jnp.einsum("...ia,ik->...ka", stack, sinp)
                wre = cw[..., :, None]
                wim = sw[..., :, None]
            outs.append((re * wre - im * wim, re * wim + im * wre))
        return outs

    def _kaos_pair_replicated(self, X, mode: int):
        """Replicated-shell k-AO pairs: one culled GTO pass + two real
        phase matmuls (same culled row set as the folded pair path)."""
        Xf, cw, sw = self._fold_pair(X)
        Pre = jnp.asarray(np.real(self._repl), X.dtype)
        Pim = jnp.asarray(np.imag(self._repl), X.dtype)
        nao = self._repl_nao
        if (mode == 2 and self._repl_fused2 is not None
                and X.dtype == jnp.float32):
            out = self._repl_fused2(Xf)
        else:
            out = eval_gto(self._repl_spec, Xf, mode)
        if mode == 0:
            out = (out,)
        outs = []
        for slot, arr in enumerate(out):
            shp = arr.shape[:-1]
            kre = (arr @ Pre).reshape(shp + (self.nk, nao))
            kim = (arr @ Pim).reshape(shp + (self.nk, nao))
            if slot == 1 and mode >= 1:
                wre = cw[..., None, :, None]
                wim = sw[..., None, :, None]
            else:
                wre = cw[..., :, None]
                wim = sw[..., :, None]
            outs.append((kre * wre - kim * wim, kre * wim + kim * wre))
        return outs

    def _fold_pair(self, X):
        """Fold positions; wrap phase e^{i k.(wA)} as (cos, sin) (..., nk)."""
        frac = X @ jnp.asarray(self.lattice_inv, X.dtype)
        wrap = jnp.floor(frac)
        Xf = (frac - wrap) @ jnp.asarray(self.lattice, X.dtype)
        karg = (wrap @ jnp.asarray(self.lattice, X.dtype)) @ jnp.asarray(
            self.kpts.T, X.dtype
        )
        return Xf, jnp.cos(karg), jnp.sin(karg)

    def _folded_coeff_pair(self, params, dtype):
        """(R_re, R_im) (nao_repl, norb_tot): complex folded coefficients
        R[r, (s,k,j)] = e^{ikL_r} C^s_k[a_r, j] as real pairs — the
        general-twist counterpart of _folded_coeff, so the periodic pair
        evaluation is ONE replicated-shell GTO pass + two real matmuls
        instead of a GTO evaluation per lattice image (_kaos_pair)."""
        idx = jnp.asarray(self._repl_ao_idx)
        pr = jnp.asarray(np.real(self._repl_phase_c), dtype)
        pi = jnp.asarray(np.imag(self._repl_phase_c), dtype)
        cols_r, cols_i = [], []
        for tag in ("alpha", "beta"):
            cre = params[f"mo_coeff_{tag}_re"]
            cim = params[f"mo_coeff_{tag}_im"]
            for k in range(self.nk):
                br = cre[k].astype(dtype)[idx]
                bi = cim[k].astype(dtype)[idx]
                wr = pr[:, k][:, None]
                wi = pi[:, k][:, None]
                cols_r.append(br * wr - bi * wi)
                cols_i.append(br * wi + bi * wr)
        return (jnp.concatenate(cols_r, axis=1),
                jnp.concatenate(cols_i, axis=1))

    def _eval_pair_folded(self, params, X, mode: int):
        """Folded-coefficient general-twist evaluation (real pairs).

        mo_k = AO_repl @ (ph C_k) * e^{i k.(wA)} — numerically identical to
        the per-image route (same algebra as _eval_folded, complex split
        into (re, im)); per-(shell, image) culling comes with the
        replicated spec."""
        Xf, cw, sw = self._fold_pair(X)
        Rr, Ri = self._folded_coeff_pair(params, X.dtype)
        korb = jnp.asarray(self._korb)
        wre = cw[..., korb]  # (..., norb_tot)
        wim = sw[..., korb]
        nu = self.norb[0]
        ntot = self.norb[0] + self.norb[1]

        def combine(mr, mi, wr, wi):
            re = mr * wr - mi * wi
            im = mr * wi + mi * wr
            return (re[..., :nu], im[..., :nu], re[..., nu:], im[..., nu:])

        if mode == 0:
            if (self._repl_fused0_pair is not None
                    and X.dtype == jnp.float32):
                cat = jnp.concatenate([Rr, Ri], axis=1)
                mo = self._repl_fused0_pair(Xf, cat[self._repl_concat_rows])
                mr, mi = mo[..., :ntot], mo[..., ntot:]
            else:
                ao = eval_gto(self._repl_spec, Xf, 0)
                mr, mi = ao @ Rr, ao @ Ri
            return combine(mr, mi, wre, wim)
        if (mode == 2 and self._repl_fused2 is not None
                and X.dtype == jnp.float32):
            aos = self._repl_fused2(Xf)
        else:
            aos = eval_gto(self._repl_spec, Xf, mode)
        out = []
        for slot, arr in enumerate(aos):
            mr, mi = arr @ Rr, arr @ Ri
            if slot == 1:
                out.extend(combine(mr, mi, wre[..., None, :],
                                   wim[..., None, :]))
            else:
                out.extend(combine(mr, mi, wre, wim))
        return tuple(out)

    def eval_pair(self, params, X, mode: int):
        """Per-spin MO (re, im) pairs via real arithmetic only.

        Returns, per derivative slot and per spin:
          mode 0: (mo_up_re, mo_up_im, mo_dn_re, mo_dn_im)
          mode>=1 appends the same 4-tuples for grad (and laplacian).
        """
        if self._repl_spec is not None:
            return self._eval_pair_folded(params, X, mode)
        kaos = self._kaos_pair(X, mode)
        out = []
        for (are, aim) in kaos:
            for spin, tag in ((0, "alpha"), (1, "beta")):
                cre = params[f"mo_coeff_{tag}_re"]
                cim = params[f"mo_coeff_{tag}_im"]
                res, ims = [], []
                for k in range(self.nk):
                    ar = are[..., k, :]
                    ai = aim[..., k, :]
                    res.append(ar @ cre[k] - ai @ cim[k])
                    ims.append(ar @ cim[k] + ai @ cre[k])
                out.append(jnp.concatenate(res, axis=-1))
                out.append(jnp.concatenate(ims, axis=-1))
        return tuple(out)

    def eval(self, params, X, mode: int):
        if self.real_mode and self._repl is not None:
            return self._eval_folded(params, X, mode)
        kaos = self._kaos(X, mode)
        if mode == 0:
            (a,) = kaos
            return (
                self._mos_from_kaos(params, a, 0),
                self._mos_from_kaos(params, a, 1),
            )
        if mode == 1:
            a, g = kaos
            return (
                self._mos_from_kaos(params, a, 0),
                self._mos_from_kaos(params, a, 1),
                self._mos_from_kaos(params, g, 0),
                self._mos_from_kaos(params, g, 1),
            )
        a, g, l = kaos
        return (
            self._mos_from_kaos(params, a, 0),
            self._mos_from_kaos(params, a, 1),
            self._mos_from_kaos(params, g, 0),
            self._mos_from_kaos(params, g, 1),
            self._mos_from_kaos(params, l, 0),
            self._mos_from_kaos(params, l, 1),
        )
