"""Local-energy pieces: kinetic + open-boundary Coulomb.

Port of pyqmc/observables/energy.py:19-65 with the kinetic sweep compiled as
a lax.fori_loop over electrons (the reference loops in Python per electron).
"""

import numpy as np
import jax
import jax.numpy as jnp


def kinetic_energy(wf, params, state, positions, with_imag=False):
    """(-1/2) sum_e lap_e psi / psi and sum_e |grad_e psi/psi|^2.

    Returns (ke (nconf,), grad2 (nconf,)), or (ke, grad2, ke_im) when
    with_imag is True. The carries stay REAL arrays either way (the TPU
    backend has no complex ops); ke_im is the imaginary part of the complex
    local kinetic energy — zero in expectation, but needed by the
    complex-parameter SR gradient (observables/sr.py) and fixed-phase
    diagnostics.
    """
    nconf, nelec = positions.shape[:2]
    dtype = positions.dtype
    # real-backend twist wavefunctions carry the phase-curvature channel in
    # gradient_laplacian_pair (their gradient_laplacian returns Re only)
    use_pair = getattr(wf, "ratio_is_modulus", False) and hasattr(
        wf, "gradient_laplacian_pair"
    )

    def body(e, carry):
        lap_acc, grad2_acc, lapim_acc = carry
        if use_pair:
            gr, gi, lap_re, lap_im = wf.gradient_laplacian_pair(
                params, state, e, positions[:, e, :]
            )
            return (
                lap_acc + lap_re,
                grad2_acc + jnp.sum(gr * gr + gi * gi, axis=-1),
                lapim_acc + lap_im,
            )
        g, lap = wf.gradient_laplacian(params, state, e, positions[:, e, :])
        lap_im = jnp.imag(lap) if jnp.iscomplexobj(lap) else jnp.zeros_like(lap_acc)
        return (
            lap_acc + jnp.real(lap),
            grad2_acc + jnp.sum(jnp.abs(g) ** 2, axis=-1),
            lapim_acc + lap_im,
        )

    lap0 = jnp.zeros(nconf, dtype=dtype)
    lap, grad2, lap_im = jax.lax.fori_loop(0, nelec, body, (lap0, lap0, lap0))
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
