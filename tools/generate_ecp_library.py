"""Generate the "tpu1" ECP + valence-basis library (VERDICT r2 item 7).

For each element, fit a ccECP-form pseudopotential against this package's
own all-electron UHF valence levels (system/ecp_generate.py), then fit a
DZ-quality contracted valence basis for the pseudo-atom
(system/basis_fit.py). Prints NWChem exchange-format blocks ready to be
embedded in system/basis.py, plus the fit diagnostics that the tests
pin.

Run (CPU, slow — one all-electron + many pseudo-atom SCF per element):
  python tools/generate_ecp_library.py B F Ne
  python tools/generate_ecp_library.py Na Mg Al Si P S Cl Ar
  python tools/generate_ecp_library.py Ti        # [Ne]-core 3d metal
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from pyqmc_tpu.system.ecp_generate import generate_ecp, to_nwchem
from pyqmc_tpu.system.elements import atomic_number
from pyqmc_tpu.system import basis_fit


# element -> (ncore, lmax_val, polarization exps {l: [exps]})
PLAN = {
    # second row, [He] core
    "B":  (2, 1, {2: [0.40]}),
    "C":  (2, 1, {2: [0.56]}),
    "N":  (2, 1, {2: [0.85]}),
    "O":  (2, 1, {2: [1.20]}),
    "F":  (2, 1, {2: [1.60]}),
    "Ne": (2, 1, {2: [2.00]}),
    # third row, [Ne] core
    "Na": (10, 1, {1: [0.06]}),
    "Mg": (10, 1, {1: [0.10]}),
    "Al": (10, 1, {2: [0.19]}),
    "Si": (10, 1, {2: [0.28]}),
    "P":  (10, 1, {2: [0.37]}),
    "S":  (10, 1, {2: [0.48]}),
    "Cl": (10, 1, {2: [0.60]}),
    "Ar": (10, 1, {2: [0.74]}),
    # 3d metals, [Ne] core (semicore 3s/3p in valence)
    "Ti": (10, 2, {}),
    "Fe": (10, 2, {}),
    "Cu": (10, 2, {}),
}


def occupied_l(symbol, ncore, lmax_val):
    """l channels with occupied valence electrons (for the basis fit)."""
    from pyqmc_tpu.system.ecp_generate import GROUND_SPIN  # noqa: F401

    Z = atomic_number(symbol)
    nval = Z - ncore
    # crude aufbau over valence shells
    if lmax_val >= 2:
        return (0, 1, 2)
    if ncore == 2:
        return (0,) if nval <= 2 else (0, 1)
    if ncore == 10:
        return (0,) if nval <= 2 else (0, 1)
    return (0, 1)


def run(symbol):
    ncore, lmax_val, pol = PLAN[symbol]
    print(f"=== {symbol} (ncore={ncore}) ===", flush=True)
    entry, info = generate_ecp(symbol, ncore, lmax_val=lmax_val, verbose=True)
    print(f"  fit max residual {info['max_resid']:.5f} "
          f"(eps in Ha / <r> relative)")
    for l, lv in sorted(info["ae_targets"].items()):
        ps = info["pseudo_levels"].get(l, [])
        for j, (e_ae, r_ae) in enumerate(lv):
            e_ps, r_ps = ps[j] if j < len(ps) else (float("nan"),) * 2
            print(f"    l={l} level {j}: eps {e_ae:9.5f} -> {e_ps:9.5f}  "
                  f"<r> {r_ae:7.4f} -> {r_ps:7.4f}")
    print("  NWChem ECP block:")
    print(to_nwchem(symbol, entry))
    # valence basis for the freshly fitted ECP
    occ = occupied_l(symbol, ncore, lmax_val)
    free = {l: e for l, e in pol.items()}
    # one extra diffuse function per occupied channel (exponent ~ 0.3x the
    # softest contracted primitive is handled inside the even-tempered sea;
    # use a fixed variational-quality guess here)
    basis, binfo = basis_fit.fit_atomic_valence_basis(
        symbol, ecp={symbol: entry}, occ_l=occ, free_exps=free,
        spin=info["spin"],
    )
    print(f"  basis fit: pseudo-atom UHF in sea {binfo['sea_e_tot']:.5f} Ha")
    print("  pyscf-format basis:")
    print("  " + json.dumps(basis))
    print(flush=True)
    return entry, basis, info


if __name__ == "__main__":
    for symbol in (sys.argv[1:] or ["B"]):
        try:
            run(symbol)
        except Exception as e:
            print(f"  {symbol} FAILED: {e}", flush=True)
