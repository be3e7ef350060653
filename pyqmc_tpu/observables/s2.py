"""<S^2> accumulator (port of pyqmc/observables/s2_accumulator.py:4-88).

  <S^2> = Sz(Sz+1) + Ndn - sum_{i in up, j in dn} <P_ij>

where <P_ij> is the expectation of the spatial exchange ratio
psi(..., r_i <-> r_j, ...)/psi. The pair swap is evaluated as two sequential
single-electron replacements on a scratch state (testvalue -> forced
updateinternals -> testvalue), compiled as nested fori loops.
"""

import jax
import jax.numpy as jnp


class S2Accumulator:
    def __init__(self, mol):
        self.nup, self.ndn = mol.nelec

    def __call__(self, wf, params, state, positions, key=None):
        nconf = positions.shape[0]
        dtype = positions.dtype
        nup, ndn = self.nup, self.ndn
        sz = 0.5 * (nup - ndn)
        base = sz * (sz + 1.0) + ndn

        if ndn == 0 or nup == 0:
            return {"S2": jnp.full(nconf, base, dtype)}

        ones = jnp.ones(nconf, dtype=bool)

        # real-backend twist wavefunctions return |ratio| from testvalue;
        # the exchange expectation needs Re(r1 r2), so take the complex
        # pair channel when present (models/slater_pair.testvalue_pair)
        use_pair = getattr(wf, "ratio_is_modulus", False)

        def pair_swap(i, j):
            ri = positions[:, i, :]
            rj = positions[:, j, :]
            if use_pair:
                r1r, r1i, saved1 = wf.testvalue_pair(params, state, i, rj)
                st1 = wf.updateinternals(params, state, i, rj, ones, saved1)
                r2r, r2i, _ = wf.testvalue_pair(params, st1, j, ri)
                return r1r * r2r - r1i * r2i
            r1, saved1 = wf.testvalue(params, state, i, rj)
            st1 = wf.updateinternals(params, state, i, rj, ones, saved1)
            r2, _ = wf.testvalue(params, st1, j, ri)
            return jnp.real(r1 * r2)

        def body_i(i, acc):
            def body_j(j, acc2):
                return acc2 + pair_swap(i, j + nup)

            return jax.lax.fori_loop(0, ndn, body_j, acc)

        swap_sum = jax.lax.fori_loop(0, nup, body_i, jnp.zeros(nconf, dtype))
        return {"S2": base - swap_sum}

    def avg(self, wf, params, state, positions, key=None):
        dat = self(wf, params, state, positions, key)
        return {k: jnp.mean(v, axis=0) for k, v in dat.items()}

    def keys(self):
        return {"S2"}

    def shapes(self):
        return {"S2": ()}
