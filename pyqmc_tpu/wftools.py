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


def generate_slater(mol, mf, tol: float = 1e-8):
    """Single- (or natural-orbital multi-) determinant Slater from SCF."""
    return Slater.from_mean_field(mf)


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


def generate_wf(mol, mf, jastrow=True, jastrow3=False):
    """Slater x Jastrow(s); returns (wf, params, to_opt).

    to_opt freezes orbital/determinant coefficients by default (the common
    workflow optimizes Jastrows first; cf. recipes.py:31-110).
    """
    wfs = [generate_slater(mol, mf)]
    to_opts = [
        {"det_coeff": False, "mo_coeff_alpha": False, "mo_coeff_beta": False}
    ]
    if jastrow:
        j, t = generate_jastrow(mol)
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


def read_wf_params(hdf_grp, params_template):
    """Load parameters saved by save_wf_params into the template's structure
    (wftools.read_wf, wftools.py:244-272)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = np.asarray(hdf_grp[key])
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: {arr.shape} vs {np.shape(leaf)}")
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)
