"""Local-energy pieces: kinetic + open-boundary Coulomb.

Port of pyqmc/observables/energy.py:19-65 with the kinetic sweep VECTORIZED
over electrons (the reference loops in Python per electron; a sequential
lax.fori_loop was measured dispatch-bound on TPU — hundreds of micro-ops on
(nconf,)-sized tensors — so electrons are vmapped into one batched
evaluation, chunked to bound the footprint for large systems)."""

import numpy as np
import jax
import jax.numpy as jnp


def kinetic_energy(wf, params, state, positions, with_imag=False,
                   echunk="auto"):
    """(-1/2) sum_e lap_e psi / psi and sum_e |grad_e psi/psi|^2.

    Returns (ke (nconf,), grad2 (nconf,)), or (ke, grad2, ke_im) when
    with_imag is True. The carries stay REAL arrays either way (the TPU
    backend has no complex ops); ke_im is the imaginary part of the complex
    local kinetic energy — zero in expectation, but needed by the
    complex-parameter SR gradient (observables/sr.py) and fixed-phase
    diagnostics.

    echunk: electrons vmapped per batched gradient_laplacian call (chunked
    with a scan above that size to bound the AO-evaluation footprint).
    "auto" bounds the batch at 16k (electron, walker) evaluation points,
    resolved from the static shapes at trace time; None = all electrons.
    """
    nconf, nelec = positions.shape[:2]
    if echunk == "auto":
        echunk = max(1, 16384 // max(nconf, 1))
    dtype = positions.dtype
    # real-backend twist wavefunctions carry the phase-curvature channel in
    # gradient_laplacian_pair (their gradient_laplacian returns Re only)
    use_pair = getattr(wf, "ratio_is_modulus", False) and hasattr(
        wf, "gradient_laplacian_pair"
    )

    def one(e):
        """(lap_re, grad2, lap_im) contribution of electron e: (nconf,)x3."""
        if use_pair:
            gr, gi, lap_re, lap_im = wf.gradient_laplacian_pair(
                params, state, e, positions[:, e, :]
            )
            return lap_re, jnp.sum(gr * gr + gi * gi, axis=-1), lap_im
        g, lap = wf.gradient_laplacian(params, state, e, positions[:, e, :])
        lap_im = (
            jnp.imag(lap) if jnp.iscomplexobj(lap)
            else jnp.zeros(nconf, dtype)
        )
        return (
            jnp.real(lap),
            jnp.sum(jnp.abs(g) ** 2, axis=-1),
            lap_im,
        )

    es = jnp.arange(nelec)
    if echunk is None or echunk >= nelec:
        la, g2, li = jax.vmap(one)(es)  # (nelec, nconf)
        lap = jnp.sum(la, axis=0)
        grad2 = jnp.sum(g2, axis=0)
        lap_im = jnp.sum(li, axis=0)
    else:
        pad = (-nelec) % echunk
        es_p = jnp.concatenate([es, jnp.zeros(pad, es.dtype)])
        valid = (jnp.arange(nelec + pad) < nelec).astype(dtype)

        def chunk_body(carry, args):
            ec, vc = args
            la, g2, li = jax.vmap(one)(ec)
            v = vc[:, None]
            return (
                carry[0] + jnp.sum(la * v, axis=0),
                carry[1] + jnp.sum(g2 * v, axis=0),
                carry[2] + jnp.sum(li * v, axis=0),
            ), None

        z = jnp.zeros(nconf, dtype)
        (lap, grad2, lap_im), _ = jax.lax.scan(
            chunk_body, (z, z, z),
            (es_p.reshape(-1, echunk), valid.reshape(-1, echunk)),
        )
    if with_imag:
        return -0.5 * lap, grad2, -0.5 * lap_im
    return -0.5 * lap, grad2


class OpenCoulomb:
    """ee + ei + ii for open boundary conditions (energy.py:19-54)."""

    def __init__(self, mol):
        self.atom_coords = np.asarray(mol.atom_coords)
        self.atom_charges = np.asarray(mol.atom_charges, dtype=np.float64)
        # constant ion-ion energy
        self.ii = mol.nuclear_repulsion()

    def energy(self, positions):
        dtype = positions.dtype
        nconf, nelec = positions.shape[:2]
        # ee
        d = positions[:, :, None, :] - positions[:, None, :, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        iu = jnp.triu_indices(nelec, k=1)
        ee = jnp.sum(1.0 / r[:, iu[0], iu[1]], axis=-1) if nelec > 1 else jnp.zeros(nconf, dtype)
        # ei
        dei = positions[:, :, None, :] - jnp.asarray(self.atom_coords, dtype)[None, None]
        rei = jnp.sqrt(jnp.sum(dei * dei, axis=-1))
        ei = -jnp.sum(jnp.asarray(self.atom_charges, dtype)[None, None, :] / rei, axis=(1, 2))
        return ee, ei, jnp.full(nconf, self.ii, dtype=dtype)
