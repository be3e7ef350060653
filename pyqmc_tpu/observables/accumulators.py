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
        self.mol = mol
        self.periodic = getattr(mol, "lattice", None) is not None
        if self.periodic:
            if ewald is None:
                from .ewald import Ewald

                ewald = Ewald(mol)
            self.coulomb = ewald
        else:
            self.coulomb = OpenCoulomb(mol)
        self.ecp_acc = ecp_acc

    def __call__(self, wf, params, state, positions, key=None):
        ke, grad2 = kinetic_energy(wf, params, state, positions)
        ee, ei, ii = self.coulomb.energy(positions)
        out = {"ke": ke, "ee": ee, "ei": ei, "ii": ii, "grad2": grad2}
        if self.ecp_acc is not None:
            if key is None:
                key = jax.random.PRNGKey(0)
            out["ecp"] = self.ecp_acc(wf, params, state, positions, key)
        else:
            out["ecp"] = jnp.zeros_like(ke)
        out["total"] = ke + ee + ei + ii + out["ecp"]
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
