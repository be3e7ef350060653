"""Assemble pyqmc_tpu/system/tpu1_library.py from tools/tpu1_out/*.json.

Each JSON record is produced by tools/generate_ecp_library.py (one fitted
ccECP-form pseudopotential + DZ-quality contracted valence basis per
element, with fit diagnostics). This tool renders them into a generated,
committed Python module registered as ECP library "tpu1" and basis
"tpu1dz" in system/basis.py. Rerun after regenerating any element:

  python tools/assemble_tpu1.py
"""

import glob
import json
import os
import sys

HERE = os.path.dirname(__file__)
OUTDIR = os.path.join(HERE, "tpu1_out")
TARGET = os.path.join(HERE, "..", "pyqmc_tpu", "system", "tpu1_library.py")

# render order = atomic number
ORDER = ["B", "C", "N", "O", "F", "Ne", "Na", "Mg", "Al", "Si", "P", "S",
         "Cl", "Ar", "Ti", "Fe", "Cu"]

HEADER = '''"""GENERATED tpu1 ECP + valence-basis library. Do not edit by hand.

Regenerate with tools/generate_ecp_library.py (fit) followed by
tools/assemble_tpu1.py (render). Each entry is a ccECP-functional-form
pseudopotential fitted so the pseudo-atom reproduces this package's own
all-electron UHF valence eigenvalues, radial moments, and first
ionization energy (system/ecp_generate.py), paired with an ANO-style
contracted DZ valence basis fitted for that ECP (system/basis_fit.py).
These are NOT the published ccECP parameters (unavailable offline);
elements with published digits live in basis.py's "ccecp" library.
Reference role: the breadth pyqmc reaches through PySCF's tables
(/root/reference/pyqmc/pyscftools.py).

TPU1_META per element records the fit quality: max_resid (largest
eigenvalue [Ha] / relative <r> residual of the ECP fit), ip_ae (the
all-electron ionization-energy target), and basis_error (contracted -
sea pseudo-atom UHF energy, Ha).
"""

# fmt: off
'''


def fmt_basis(basis, indent="        "):
    lines = []
    for fn in basis:
        l = fn[0]
        prims = ", ".join(f"[{e:.8g}, {c:.10g}]" for e, c in fn[1:])
        lines.append(f"{indent}[{l}, {prims}],")
    return "\n".join(lines)


def main():
    records = {}
    for path in glob.glob(os.path.join(OUTDIR, "*.json")):
        with open(path) as f:
            r = json.load(f)
        records[r["symbol"]] = r
    if not records:
        sys.exit("no records in tools/tpu1_out/")
    symbols = [s for s in ORDER if s in records]
    extra = sorted(set(records) - set(symbols))
    symbols += extra

    nwchem_parts = ["ECP"]
    basis_parts = []
    meta_parts = []
    sys.path.insert(0, os.path.join(HERE, ".."))
    from pyqmc_tpu.system.ecp_generate import to_nwchem

    for s in symbols:
        r = records[s]
        # re-render from the full-precision entry (the text stored in the
        # JSON was rendered at fit time with whatever precision to_nwchem
        # had then; the entry itself is exact)
        nwchem_parts.append(to_nwchem(s, r["entry"]))
        basis_parts.append(f'    "{s}": [\n{fmt_basis(r["basis"])}\n    ],')
        ei = r["ecp_info"]
        bi = r["basis_info"]
        meta_parts.append(
            f'    "{s}": {{"ncore": {r["ncore"]}, '
            f'"max_resid": {ei["max_resid"]:.6f}, '
            f'"ip_ae": {ei["ip_ae"]:.6f}, '
            f'"spin": {ei["spin"]}, '
            f'"sea_e_tot": {bi["sea_e_tot"]:.8f}, '
            f'"contracted_e_tot": {bi["contracted_e_tot"]:.8f}, '
            f'"basis_error": {bi["basis_error"]:.6f}}},'
        )
    nwchem_parts.append("END")

    body = HEADER
    body += 'TPU1_ECP_NWCHEM = """\n' + "\n".join(nwchem_parts) + '\n"""\n\n'
    body += "TPU1_BASIS = {\n" + "\n".join(basis_parts) + "\n}\n\n"
    body += "TPU1_META = {\n" + "\n".join(meta_parts) + "\n}\n"

    with open(TARGET, "w") as f:
        f.write(body)
    print(f"wrote {os.path.normpath(TARGET)}: {len(symbols)} elements "
          f"({', '.join(symbols)})")


if __name__ == "__main__":
    main()
