"""Effective-core-potential (semi-local pseudopotential) evaluation.

TPU-first replacement for pyqmc/observables/eval_ecp.py + jax_ecp.py:

  * octahedral quadrature grids (naip 6/18/26, exact through P_3/P_5/P_7)
    with a random rotation per (walker, atom) drawn from a counter-based key
    (eval_ecp.py:255-336 semantics);
  * ONE wf.testvalue call per electron covering all atoms x quadrature
    points through the aux axis (the design the reference's jax_ecp.py:98
    reaches for);
  * no stochastic channel masking: dense static-shape evaluation is cheaper
    on TPU than data-dependent masking and has strictly lower variance than
    the reference's stochastic downselection (eval_ecp.py:135-146);
  * the same pass exposes T-move weights for DMC (eval_ecp.py:43-80).

ECP data format is pyscf's: {el: [ncore, [[l, [slots r^0..r^6]], ...]]} with
radial term coeff * r^(power-2) * exp(-exp * r^2); l = -1 is the local
channel.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# --- quadrature grids ------------------------------------------------------

def octahedral_grid(naip: int):
    """(points (naip, 3), weights (naip,)); exact for P_l with l <= 3/5/7."""
    verts = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        dtype=np.float64,
    )
    if naip == 6:
        return verts, np.full(6, 1.0 / 6.0)
    edges = []
    for i in (-1.0, 1.0):
        for j in (-1.0, 1.0):
            edges += [[i, j, 0], [i, 0, j], [0, i, j]]
    edges = np.asarray(edges) / np.sqrt(2.0)
    if naip == 18:
        pts = np.concatenate([verts, edges])
        w = np.concatenate([np.full(6, 1.0 / 30.0), np.full(12, 1.0 / 15.0)])
        return pts, w
    faces = []
    for i in (-1.0, 1.0):
        for j in (-1.0, 1.0):
            for k in (-1.0, 1.0):
                faces.append([i, j, k])
    faces = np.asarray(faces) / np.sqrt(3.0)
    if naip == 26:
        pts = np.concatenate([verts, edges, faces])
        w = np.concatenate(
            [np.full(6, 40.0 / 840.0), np.full(12, 32.0 / 840.0), np.full(8, 27.0 / 840.0)]
        )
        return pts, w
    raise ValueError(f"naip must be 6, 18 or 26, got {naip}")


def random_rotations(key, shape):
    """Uniform random rotation matrices (..., 3, 3) via quaternions."""
    q = jax.random.normal(key, shape + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(shape + (3, 3))


def legendre(l, x):
    if l == 0:
        return jnp.ones_like(x)
    if l == 1:
        return x
    if l == 2:
        return 0.5 * (3 * x * x - 1)
    if l == 3:
        return 0.5 * (5 * x**3 - 3 * x)
    raise ValueError(f"l={l} not supported")


# --- radial channels --------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class _Channel:
    l: int  # -1 = local
    coeffs: Tuple[float, ...]
    exps: Tuple[float, ...]
    powers: Tuple[int, ...]  # r^(power-2)

    def evaluate(self, r):
        """v_l(r) for r (...,)."""
        out = jnp.zeros_like(r)
        for c, e, n in zip(self.coeffs, self.exps, self.powers):
            out = out + c * r ** (n - 2) * jnp.exp(-e * r * r)
        return out


@dataclasses.dataclass(frozen=True)
class _AtomECP:
    atom: int
    local: _Channel
    nonlocal_channels: Tuple[_Channel, ...]


def _parse_ecp(mol) -> List[_AtomECP]:
    out = []
    for ia, sym in enumerate(mol.atom_symbols):
        if sym not in mol.ecp:
            continue
        _, channels = mol.ecp[sym]
        local = None
        nl = []
        for l, slots in channels:
            coeffs, exps, powers = [], [], []
            for power, terms in enumerate(slots):
                for e, c in terms:
                    coeffs.append(c)
                    exps.append(e)
                    powers.append(power)
            ch = _Channel(l, tuple(coeffs), tuple(exps), tuple(powers))
            if l == -1:
                local = ch
            else:
                nl.append(ch)
        out.append(_AtomECP(ia, local, tuple(sorted(nl, key=lambda c: c.l))))
    return out


class ECPAccumulator:
    """ecp(wf, params, state, positions, key) -> per-walker ECP energy."""

    def __init__(self, mol, naip: int = 6, rmax: float = 10.0, nselect=None):
        """nselect: static number of quadrature points actually evaluated
        per electron (importance downselection, jax_ecp.py:217-272): the
        |T_q|-largest nselect//2 points are kept deterministically, the rest
        sampled with replacement with p ~ |T_q| and reweighted (unbiased).
        None = dense evaluation of all natoms_ecp * naip points."""
        self.atoms = _parse_ecp(mol)
        self.atom_coords = np.asarray(mol.atom_coords)
        self.naip = naip
        pts, w = octahedral_grid(naip)
        self.quad_pts = pts
        self.quad_w = w
        self.nelec = sum(mol.nelec)
        self.rmax = rmax  # beyond this the nonlocal projection is negligible
        self.nselect = nselect

    @property
    def active(self):
        return len(self.atoms) > 0

    def _quadrature_geometry(self, positions, e, key):
        """aux points and matrix-element weights for electron e (no wf calls).

        Returns (aux (c, A*naip, 3), T (c, A*naip), None) with
        T_q = sum_l (2l+1) v_l(r_I) P_l(costh_q) w_q the off-diagonal matrix
        element weight, so the nonlocal energy is sum_q T_q Re(ratio_q) and
        T-move amplitudes are tau * max(0, -T_q Re(ratio_q)).
        """
        nconf = positions.shape[0]
        dtype = positions.dtype
        epos = positions[:, e, :]
        auxs, Ts = [], []
        w = jnp.asarray(self.quad_w, dtype)
        for k, aecp in enumerate(self.atoms):
            R = jnp.asarray(self.atom_coords[aecp.atom], dtype)
            d = epos - R  # (nconf, 3)
            r = jnp.linalg.norm(d, axis=-1)
            rot = random_rotations(jax.random.fold_in(key, k), (nconf,))  # (c,3,3)
            pts = jnp.asarray(self.quad_pts, dtype)  # (naip, 3)
            dirs = jnp.einsum("cxy,qy->cqx", rot, pts)  # (c, naip, 3)
            aux = R[None, None, :] + r[:, None, None] * dirs  # (c, naip, 3)
            costh = jnp.einsum("cqx,cx->cq", dirs, d / jnp.maximum(r, 1e-12)[:, None])
            inside = (r < self.rmax).astype(dtype)
            T = jnp.zeros((nconf, self.naip), dtype)
            for ch in aecp.nonlocal_channels:
                T = T + (
                    (2 * ch.l + 1) * ch.evaluate(r) * inside
                )[:, None] * legendre(ch.l, costh) * w[None, :]
            auxs.append(aux)
            Ts.append(T)
        aux_all = jnp.concatenate(auxs, axis=1)  # (c, A*naip, 3)
        T_all = jnp.concatenate(Ts, axis=1)
        return aux_all, T_all, None

    def _electron_quadrature(self, wf, params, state, positions, e, key):
        """Dense quadrature incl. wavefunction ratios at every point."""
        aux_all, T_all, _ = self._quadrature_geometry(positions, e, key)
        ratios, _ = wf.testvalue(params, state, e, aux_all)
        return aux_all, T_all, ratios

    def _nonlocal_electron(self, wf, params, state, positions, e, key):
        """Nonlocal ECP energy contribution of electron e (nconf,)."""
        nq_total = len(self.atoms) * self.naip
        if self.nselect is None or self.nselect >= nq_total:
            _, T, ratios = self._electron_quadrature(
                wf, params, state, positions, e, key
            )
            return jnp.sum(T * jnp.real(ratios), axis=1)
        return self._nonlocal_electron_downselect(
            wf, params, state, positions, e, key
        )

    def _nonlocal_electron_downselect(self, wf, params, state, positions, e, key):
        """Evaluate only nselect points: |T|-top-k deterministic + stochastic
        remainder with importance reweighting (unbiased; static shapes)."""
        nconf = positions.shape[0]
        dtype = positions.dtype
        aux, T, _ = self._quadrature_geometry(positions, e, key)
        nq = T.shape[1]
        ndet = self.nselect // 2
        nstoch = self.nselect - ndet
        absT = jnp.abs(T)
        # deterministic top-k
        topv, topi = jax.lax.top_k(absT, ndet)  # (c, ndet)
        # stochastic remainder: zero out the deterministic picks
        rest = absT.at[jnp.arange(nconf)[:, None], topi].set(0.0)
        norm = jnp.sum(rest, axis=1, keepdims=True)
        safe = jnp.where(norm == 0, 1.0, norm)
        p = rest / safe  # (c, nq)
        sidx = jax.random.categorical(
            jax.random.fold_in(key, 777),
            jnp.log(jnp.maximum(p, 1e-30)), shape=(nstoch, nconf)
        ).T  # (c, nstoch)
        # reweighting: deterministic weight 1; stochastic T_q / (nstoch p_q)
        pw = jnp.take_along_axis(p, sidx, axis=1)
        any_rest = (norm[:, 0] > 0).astype(dtype)
        wstoch = any_rest[:, None] / (nstoch * jnp.maximum(pw, 1e-30))
        idx = jnp.concatenate([topi, sidx], axis=1)  # (c, nsel)
        wts = jnp.concatenate([jnp.ones_like(topv), wstoch], axis=1)
        Tsel = jnp.take_along_axis(T, idx, axis=1) * wts
        aux_sel = jnp.take_along_axis(aux, idx[:, :, None], axis=1)
        ratios, _ = wf.testvalue(params, state, e, aux_sel)
        return jnp.sum(Tsel * jnp.real(ratios), axis=1)

    def tmove_data(self, wf, params, state, positions, e, key, tau):
        """T-move proposal set for electron e (Casula size-consistent form,
        cf. eval_ecp.py:43-80): (aux points, amplitudes t_q >= 0)."""
        aux, T, ratios = self._electron_quadrature(
            wf, params, state, positions, e, key
        )
        t = tau * jnp.maximum(0.0, -(T * jnp.real(ratios)))
        return aux, t

    def __call__(self, wf, params, state, positions, key):
        nconf = positions.shape[0]
        dtype = positions.dtype
        if not self.atoms:
            return jnp.zeros(nconf, dtype)
        # local part: all electrons x ECP atoms
        local = jnp.zeros(nconf, dtype)
        for aecp in self.atoms:
            R = jnp.asarray(self.atom_coords[aecp.atom], dtype)
            r = jnp.linalg.norm(positions - R[None, None, :], axis=-1)  # (c, ne)
            local = local + jnp.sum(aecp.local.evaluate(r), axis=1)

        def body(e, acc):
            return acc + self._nonlocal_electron(
                wf, params, state, positions, e, jax.random.fold_in(key, 1000 + e)
            )

        nl = jax.lax.fori_loop(0, self.nelec, body, jnp.zeros(nconf, dtype))
        return local + nl
