"""Accumulators (port of pyqmc/observables/accumulators.py:45-96).

Protocol: acc(wf, params, state, positions) -> dict of per-walker arrays;
acc.avg(...) -> dict of means over walkers (psum-reduced automatically when
run under a sharded jit). Everything is jit-compatible.
"""

import jax
import jax.numpy as jnp

from .energy import OpenCoulomb, kinetic_energy


class EnergyAccumulator:
    """{ke, ee, ei, ii, ecp, grad2, total} local-energy accumulator."""

    def __init__(self, mol, ecp_acc=None, ewald=None):
        """ecp_acc: explicit ECPAccumulator, or None to build one
        automatically when mol carries an ECP (pass False to force the
        ECP term off). Silent omission of the ECP for an ECP molecule
        gave VMC energies ~1 Ha below RHF for ccECP H2O."""
        self.mol = mol
        self.periodic = getattr(mol, "lattice", None) is not None
        if self.periodic:
            if ewald is None:
                from .ewald import Ewald

                ewald = Ewald(mol)
            self.coulomb = ewald
        else:
            self.coulomb = OpenCoulomb(mol)
        if ecp_acc is None and getattr(mol, "ecp", None):
            from .ecp import ECPAccumulator

            ecp_acc = ECPAccumulator(mol)
        self.ecp_acc = ecp_acc or None

    def __call__(self, wf, params, state, positions, key=None, with_imag=False):
        """Per-walker local-energy components. with_imag=True adds
        "total_im", the imaginary part of the complex local energy (zero in
        expectation; consumed by the complex-parameter SR gradient)."""
        ke, grad2, ke_im = kinetic_energy(
            wf, params, state, positions, with_imag=True
        )
        ee, ei, ii = self.coulomb.energy(positions)
        out = {"ke": ke, "ee": ee, "ei": ei, "ii": ii, "grad2": grad2}
        ecp_im = jnp.zeros_like(ke)
        if self.ecp_acc is not None:
            if key is None:
                key = jax.random.PRNGKey(0)
            out["ecp"], ecp_im = self.ecp_acc(
                wf, params, state, positions, key, with_imag=True
            )
        else:
            out["ecp"] = jnp.zeros_like(ke)
        out["total"] = ke + ee + ei + ii + out["ecp"]
        if with_imag:
            out["total_im"] = ke_im + ecp_im
        return out

    def avg(self, wf, params, state, positions, key=None):
        dat = self(wf, params, state, positions, key=key)
        return {k: jnp.mean(v, axis=0) for k, v in dat.items()}

    def keys(self):
        return {"ke", "ee", "ei", "ii", "ecp", "grad2", "total"}

    def shapes(self):
        return {k: () for k in self.keys()}

    @property
    def has_nonlocal_moves(self):
        return self.ecp_acc is not None


def gradient_generator(mol, wf, params, to_opt=None, naip=None,
                       eps=1e-3, nodal_cutoff=1e-3, **ewald_kws):
    """Build the SR accumulator used for wavefunction optimization
    (reference accumulators.py:27-42 `gradient_generator`).

    Wires EnergyAccumulator (auto-ECP, Ewald kwargs for periodic cells) and
    a LinearTransform over the optimizable subset of `params` into a
    StochasticReconfiguration accumulator ready to pass to
    `line_minimization`."""
    from .sr import StochasticReconfiguration
    from .transform import LinearTransform

    ecp_acc = None
    if getattr(mol, "ecp", None):
        from .ecp import ECPAccumulator

        ecp_acc = ECPAccumulator(mol, naip=naip)
    ewald = None
    if getattr(mol, "lattice", None) is not None and ewald_kws:
        from .ewald import Ewald

        ewald = Ewald(mol, **ewald_kws)
    energy = EnergyAccumulator(mol, ecp_acc=ecp_acc, ewald=ewald)
    transform = LinearTransform(params, to_opt)
    return StochasticReconfiguration(
        energy, transform, eps=eps, nodal_cutoff=nodal_cutoff
    )
