"""GENERATED tpu1 ECP + valence-basis library. Do not edit by hand.

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
TPU1_ECP_NWCHEM = """
ECP
B nelec 2
B ul
1 9.40660047 3.00000000
2 164.20453165 -59.54097227
3 9.40660047 28.21980141
B S
2 5.79200188 36.16558585
B P
2 11.37009907 -33.74043236
F nelec 2
F ul
1 83.80898920 7.00000000
2 0.21622222 0.00025540
3 83.80898920 586.66292440
F S
2 9.90831053 36.78281086
F P
2 21.63251691 -15.09792244
END
"""

TPU1_BASIS = {
    "B": [
        [0, [0.045, 0.03733867499], [0.09, 0.2751757092], [0.18, 0.4441541861], [0.36, 0.331286889], [0.72, 0.06150790312], [1.44, -0.07227250787], [2.88, -0.1430525511], [5.76, -0.003589830977], [11.52, 0.01994749532], [23.04, -0.006941871263], [46.08, 0.002827594738], [92.16, -0.001063994721], [184.32, 0.000532374381], [368.64, -0.000205342973]],
        [0, [0.09, 1]],
        [1, [0.045, 0.08831721445], [0.09, 0.2365635678], [0.18, 0.3224832625], [0.36, 0.2662687433], [0.72, 0.1698438045], [1.44, 0.08196717864], [2.88, 0.0347136561], [5.76, 0.01565400811], [11.52, 0.01358043236], [23.04, 0.001734188582], [46.08, 0.0001283507297], [92.16, 0.0002345154851]],
        [1, [0.045, 1]],
        [2, [0.4, 1]],
    ],
    "F": [
        [0, [0.045, 0.00076304858], [0.09, -0.0006092260602], [0.18, 0.06877368381], [0.36, 0.2735853417], [0.72, 0.4291989147], [1.44, 0.2977653305], [2.88, 0.08601133419], [5.76, -0.1260225814], [11.52, -0.02468521825], [23.04, 0.01269548535], [46.08, -0.01256966302], [92.16, 0.001944398252], [184.32, -0.0004337284225], [368.64, 0.0002079214145]],
        [0, [0.36, 1]],
        [1, [0.045, -0.0001533993674], [0.09, -0.01173456675], [0.18, -0.08885565719], [0.36, -0.2145383125], [0.72, -0.2885363635], [1.44, -0.2742787438], [2.88, -0.1958520031], [5.76, -0.1057342959], [11.52, -0.04711666429], [23.04, -0.01586091035], [46.08, 0.004359962022], [92.16, 0.00133685024], [184.32, -0.0004142343556], [368.64, 0.0001140734292]],
        [1, [0.045, 0.000416597061], [0.09, 0.01869977265], [0.18, 0.1046267727], [0.36, 0.2182671673], [0.72, 0.2768965993], [1.44, 0.2604320225], [2.88, 0.1873352725], [5.76, 0.1019339877], [11.52, 0.04549518324], [23.04, 0.01529793458], [46.08, -0.004193709188], [92.16, -0.001288425127], [184.32, 0.0003990446327], [368.64, -0.0001098951734]],
        [1, [0.18, 1]],
        [2, [1.6, 1]],
    ],
}

TPU1_META = {
    "B": {"ncore": 2, "max_resid": 0.004245, "ip_ae": 0.291784, "spin": 1, "sea_e_tot": -2.53882398, "contracted_e_tot": -2.54148934, "basis_error": -0.002665},
    "F": {"ncore": 2, "max_resid": 0.004199, "ip_ae": 0.575520, "spin": 1, "sea_e_tot": -23.83376524, "contracted_e_tot": -23.83637722, "basis_error": -0.002612},
}
