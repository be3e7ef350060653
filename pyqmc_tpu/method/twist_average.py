"""Twist-averaged boundary conditions.

Workflow counterpart of the reference's supercell-twist examples
(examples/trial_wf/, pbc/twists.py): group a primitive k-mesh by supercell
twist, build one k-point Slater per twist, run VMC per twist, and combine
with equal (or k-count) weights.
"""

from __future__ import annotations

import numpy as np
import jax

from ..system.supercell import create_supercell_twists
from ..models.orbitals import KPointOrbitals
from ..models.slater import Slater, DeterminantExpansion
from .vmc import vmc as vmc_run


def build_twist_wf(cell, supercell, kpts, mo_coeff, mo_occ, twist_indices):
    """Slater wavefunction for one twist.

    mo_coeff: per spin, list over ALL primitive k of (nao, nmo); mo_occ
    likewise (occupation numbers). twist_indices selects the k subset.
    """
    blocks_a, blocks_b, na, nb = [], [], 0, 0
    for k in twist_indices:
        occ_a = np.asarray(mo_occ[0][k]) > 0.5
        occ_b = np.asarray(mo_occ[1][k]) > 0.5
        blocks_a.append(np.asarray(mo_coeff[0][k])[:, occ_a])
        blocks_b.append(np.asarray(mo_coeff[1][k])[:, occ_b])
        na += int(occ_a.sum())
        nb += int(occ_b.sum())
    if (na, nb) != supercell.nelec:
        raise ValueError(
            f"twist occupations {(na, nb)} != supercell nelec {supercell.nelec}"
        )
    orb = KPointOrbitals(cell, np.asarray(kpts)[list(twist_indices)],
                         (blocks_a, blocks_b))
    return Slater(supercell, orb, DeterminantExpansion.single(na, nb))


def twist_average_vmc(
    cell, supercell, kpts, mo_coeff, mo_occ, configs_factory, key=None,
    accumulators_factory=None, **vmc_kwargs,
):
    """Run VMC for every twist; returns (per-twist records, averaged dict).

    configs_factory(twist_index) -> initial Configs;
    accumulators_factory() -> accumulator dict (fresh per twist).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    twists = create_supercell_twists(supercell, kpts)
    records = []
    for ti, (tkey, idx) in enumerate(sorted(twists.items())):
        wf = build_twist_wf(cell, supercell, kpts, mo_coeff, mo_occ, idx)
        key, vkey = jax.random.split(key)
        accs = accumulators_factory() if accumulators_factory else None
        data, _ = vmc_run(
            wf, wf.make_params(), configs_factory(ti), accumulators=accs,
            key=vkey, **vmc_kwargs,
        )
        records.append({"twist": tkey, "kpt_indices": idx, "data": data})
    # equal-weight average over twists of every scalar block quantity
    avg = {}
    warm = max(1, len(records[0]["data"]) // 4)
    for k in records[0]["data"][0]:
        try:
            vals = [
                np.mean([blk[k] for blk in r["data"][warm:]], axis=0)
                for r in records
            ]
        except TypeError:
            continue
        avg[k] = np.mean(vals, axis=0)
    return records, avg
