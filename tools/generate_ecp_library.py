"""Generate the "tpu1" ECP + valence-basis library (VERDICT r2 item 7).

For each element, fit a ccECP-form pseudopotential against this package's
own all-electron UHF valence levels (system/ecp_generate.py), then fit a
DZ-quality contracted valence basis for the pseudo-atom
(system/basis_fit.py). Writes one JSON file per element to
tools/tpu1_out/ (entry, NWChem text, basis, diagnostics) so the library
can be assembled programmatically, and prints a human-readable summary.

Run (CPU, slow — one all-electron + many pseudo-atom SCF per element):
  python tools/generate_ecp_library.py B F Ne
  python tools/generate_ecp_library.py Na Mg Al Si P S Cl Ar
  python tools/generate_ecp_library.py Ti Fe Cu   # [Ne]-core 3d metals
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

OUTDIR = os.path.join(os.path.dirname(__file__), "tpu1_out")


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
    # 3d metals, [Ne] core (semicore 3s/3p in valence); 4p polarization
    "Ti": (10, 2, {1: [0.15]}),
    "Fe": (10, 2, {1: [0.25]}),
    "Cu": (10, 2, {1: [0.30]}),
}


def occupied_l(symbol, ncore, lmax_val):
    """l channels with occupied valence electrons (for the basis fit)."""
    Z = atomic_number(symbol)
    nval = Z - ncore
    if lmax_val >= 2:
        return (0, 1, 2)
    return (0,) if nval <= 2 else (0, 1)


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
    nwchem = to_nwchem(symbol, entry)
    print("  NWChem ECP block:")
    print(nwchem)
    # valence basis for the freshly fitted ECP
    occ = occupied_l(symbol, ncore, lmax_val)
    basis, binfo = basis_fit.fit_atomic_valence_basis(
        symbol, ecp={symbol: entry}, occ_l=occ, free_exps=dict(pol),
        spin=info["spin"],
    )
    print(f"  basis fit: sea UHF {binfo['sea_e_tot']:.5f} Ha, contracted "
          f"{binfo['contracted_e_tot']:.5f} Ha "
          f"(basis error {binfo['basis_error'] * 1000:.2f} mHa)")
    os.makedirs(OUTDIR, exist_ok=True)
    record = {
        "symbol": symbol,
        "ncore": ncore,
        "lmax_val": lmax_val,
        "entry": entry,
        "nwchem": nwchem,
        "basis": basis,
        "ecp_info": {
            k: v for k, v in info.items() if k != "ae_targets"
        } | {"ae_targets": {str(l): v for l, v in info["ae_targets"].items()},
             "pseudo_levels": {str(l): v
                               for l, v in info["pseudo_levels"].items()}},
        "basis_info": binfo,
    }
    with open(os.path.join(OUTDIR, f"{symbol}.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(f"  wrote {OUTDIR}/{symbol}.json", flush=True)
    return record


if __name__ == "__main__":
    for symbol in (sys.argv[1:] or ["B"]):
        try:
            run(symbol)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"  {symbol} FAILED: {e}", flush=True)
