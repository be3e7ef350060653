"""Wavefunction factories (port of pyqmc/wftools.py:27-307)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from .models.slater import Slater, DeterminantExpansion
from .models.jastrow import JastrowSpin
from .models.jastrow3 import ThreeBodyJastrow
from .models.multiply import MultiplyWF
from .models import func3d


def generate_slater(mol, mf, mc=None, tol: float = 1e-8):
    """Slater determinant (expansion) from SCF, optionally multi-determinant.

    mc: a (DeterminantExpansion, det_coeff) pair (e.g. from
    system.casci.run_casci/run_hci), or any external CASCI/HCI/SCI-style
    object accepted by system.ci_import.interpret_ci (parity with the
    reference's generate_slater(mc=...), wftools.py:27-61 +
    pyscftools.py:252-298).
    """
    if mc is None:
        return Slater.from_mean_field(mf)
    if isinstance(mc, tuple) and len(mc) == 2:
        exp, coeff = mc
    else:
        from .system.ci_import import interpret_ci

        exp, coeff = interpret_ci(mc, tol)
    norb_up = int(exp.occ_up.max()) + 1 if exp.occ_up.size else 0
    norb_dn = int(exp.occ_dn.max()) + 1 if exp.occ_dn.size else 0
    ca = mf.mo_coeff[0][:, :norb_up]
    cb = mf.mo_coeff[1][:, :norb_dn]
    return Slater(mol, None, exp, (ca, cb), det_coeff=jnp.asarray(coeff))


def default_jastrow_basis(mol, na=4, nb=3, rcut=None):
    periodic = getattr(mol, "lattice", None) is not None
    if rcut is None:
        if periodic:
            # half the minimal cell height (wftools.py:82-84)
            inv = np.linalg.inv(mol.lattice)
            heights = 1.0 / np.linalg.norm(inv, axis=0)
            rcut = 0.5 * float(np.min(heights))
        else:
            rcut = 7.5
    a_basis = tuple(func3d.BasisFn("polypade", 0.2 * 3.0**k, rcut) for k in range(na))
    b_basis = (func3d.BasisFn("cutoffcusp", 24.0, rcut),) + tuple(
        func3d.BasisFn("polypade", 0.2 * 3.0**k, rcut) for k in range(nb)
    )
    return a_basis, b_basis


def generate_jastrow(mol, na=4, nb=3, rcut=None):
    """Two-body Jastrow with QWalk-style defaults + e-e cusp
    (wftools.py:64-152). Returns (jastrow, to_opt)."""
    a_basis, b_basis = default_jastrow_basis(mol, na, nb, rcut)
    jas = JastrowSpin(mol, a_basis=a_basis, b_basis=b_basis)
    bmask = np.ones((len(b_basis), 3), dtype=bool)
    bmask[0] = False  # cusp row frozen
    to_opt = {"acoeff": True, "bcoeff": bmask}
    return jas, to_opt


def generate_jastrow3(mol, na=3, nb=3, rcut=None):
    a_basis, b_basis = default_jastrow_basis(mol, na, nb, rcut)
    j3 = ThreeBodyJastrow(mol, a_basis=a_basis, b_basis=b_basis[1:])
    return j3, {"ccoeff": True}


def generate_gps_jastrow(mol, n_support=4, init_spread=1.0, seed=0,
                         optimize_Xsupport=True):
    """Gaussian-process-state pair Jastrow (wftools.py:165-182). Returns
    (wf, to_opt)."""
    from .models.generic_jastrow import GPSJastrow

    wf = GPSJastrow(mol, n_support=n_support, init_spread=init_spread,
                    seed=seed)
    to_opt = {"alpha": True, "f": True, "Xsupport": bool(optimize_Xsupport)}
    return wf, to_opt


def generate_geminal_jastrow(mol):
    """Geminal (AO-pair) Jastrow; returns (wf, to_opt). The reference builds
    this through its generic jastrow list plumbing (wftools.py:236-243 with
    geminaljastrow.GeminalJastrow)."""
    from .models.generic_jastrow import GeminalJastrow

    wf = GeminalJastrow(mol)
    return wf, {"gcoeff": True}


def generate_wf(mol, mf, jastrow=True, jastrow3=False, jastrow_kws=None,
                mc=None):
    """Slater x Jastrow(s); returns (wf, params, to_opt).

    `jastrow` may be a bool (default two-body), a factory callable
    `f(mol, **kws) -> (wf, to_opt)` such as generate_gps_jastrow, or a list
    of factories (reference wftools.generate_wf, wftools.py:195-243).
    to_opt freezes orbital/determinant coefficients by default (the common
    workflow optimizes Jastrows first; cf. recipes.py:31-110).
    """
    wfs = [generate_slater(mol, mf, mc=mc)]
    to_opts = [
        {"det_coeff": False, "mo_coeff_alpha": False, "mo_coeff_beta": False}
    ]
    if callable(jastrow) or isinstance(jastrow, (list, tuple)):
        factories = jastrow if isinstance(jastrow, (list, tuple)) else [jastrow]
        kws = jastrow_kws or [{}] * len(factories)
        if not isinstance(kws, (list, tuple)):
            kws = [kws]
        for fac, kw in zip(factories, kws):
            j, t = fac(mol, **kw)
            wfs.append(j)
            to_opts.append(t)
    elif jastrow:
        j, t = generate_jastrow(mol, **(jastrow_kws or {}))
        wfs.append(j)
        to_opts.append(t)
    if jastrow3:
        j3, t3 = generate_jastrow3(mol)
        wfs.append(j3)
        to_opts.append(t3)
    if len(wfs) == 1:
        return wfs[0], wfs[0].make_params(), to_opts[0]
    wf = MultiplyWF(*wfs)
    params = wf.make_params()
    to_opt = {f"wf{i}": t for i, t in enumerate(to_opts)}
    return wf, params, to_opt


def read_superposition(mol, mf, wf_files, coeffs, **wf_kws):
    """Superposition Psi = sum_i c_i Psi_i of separately optimized SJ
    wavefunctions read from HDF5 files (wftools.read_superposition,
    wftools.py:275-307). Returns (wf, params, to_opt)."""
    import h5py
    from .models.addwf import AddWF

    wfs, param_list, to_opt = [], [], {}
    for iwf, fname in enumerate(wf_files):
        wf_i, params_i, to_opt_i = generate_wf(mol, mf, **wf_kws)
        with h5py.File(fname, "r") as f:
            if "wf" not in f:
                raise ValueError(f"no 'wf' group in {fname}")
            params_i = read_wf_params(f["wf"], params_i)
        wfs.append(wf_i)
        param_list.append(params_i)
        to_opt[f"wf{iwf}"] = to_opt_i
    wf = AddWF(*wfs)
    params = wf.make_params()
    for iwf, p in enumerate(param_list):
        params[f"wf{iwf}"] = p
    params["coeff"] = jnp.asarray(np.asarray(coeffs, dtype=np.float64))
    to_opt["coeff"] = False
    return wf, params, to_opt


def save_wf_params(hdf_grp, params):
    """Write a parameter pytree under an HDF5 group (wf/... layout,
    linemin.py:25-39)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        data = np.asarray(leaf)
        if key in hdf_grp:
            hdf_grp[key][...] = data
        else:
            hdf_grp.create_dataset(key, data=data)


def read_wf_params(hdf_grp, params_template, strict=True):
    """Load parameters saved by save_wf_params into the template's structure
    (wftools.read_wf, wftools.py:244-272).

    strict: raise if the file holds parameter groups the template does not —
    loading e.g. a jastrow3-optimized file into a 2-body-only wavefunction
    would otherwise silently drop the three-body coefficients (rebuild the
    wf with the same jastrow3/jastrow_kws flags instead)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    consumed = set()
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = np.asarray(hdf_grp[key])
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}")
        consumed.add(key)
        leaves.append(jnp.asarray(arr))
    if strict:
        stored = []
        hdf_grp.visit(
            lambda name: stored.append(name)
            if hasattr(hdf_grp[name], "shape") else None
        )
        extra = sorted(set(stored) - consumed)
        if extra:
            raise ValueError(
                f"parameter file holds groups the wavefunction does not: "
                f"{extra} — rebuild the wf with the flags (jastrow3, "
                "jastrow_kws, ...) used when it was saved, or pass "
                "strict=False to drop them"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)
