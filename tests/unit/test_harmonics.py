"""Solid-harmonic table checks: orthonormality on the sphere and known forms."""

import numpy as np

from pyqmc_tpu.ops.harmonics import (
    cart2sph_matrix,
    cart_components,
    gaussian_radial_norm,
    normalize_contraction,
)


def eval_solid(l, pts):
    """Evaluate all 2l+1 solid harmonics at pts (n, 3)."""
    C = cart2sph_matrix(l)
    comps = cart_components(l)
    mono = np.stack(
        [pts[:, 0] ** i * pts[:, 1] ** j * pts[:, 2] ** k for (i, j, k) in comps],
        axis=-1,
    )
    return mono @ C


def fibonacci_sphere(n=20000):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        axis=-1,
    )


def test_orthonormal_on_sphere():
    pts = fibonacci_sphere()
    w = 4 * np.pi / len(pts)
    ys = [eval_solid(l, pts) for l in range(7)]
    Y = np.concatenate(ys, axis=1)
    G = Y.T @ Y * w
    np.testing.assert_allclose(G, np.eye(G.shape[0]), atol=2e-3)


def test_known_forms():
    pts = np.random.default_rng(0).normal(size=(50, 3))
    x, y, z = pts.T
    r2 = x * x + y * y + z * z
    # s
    np.testing.assert_allclose(eval_solid(0, pts)[:, 0], np.sqrt(1 / (4 * np.pi)))
    # p ordered (x, y, z), pyscf convention
    p = eval_solid(1, pts)
    c = np.sqrt(3 / (4 * np.pi))
    np.testing.assert_allclose(p[:, 0], c * x)
    np.testing.assert_allclose(p[:, 1], c * y)
    np.testing.assert_allclose(p[:, 2], c * z)
    # d m=0 column (index 2): sqrt(5/16pi)(3z^2 - r^2)
    d = eval_solid(2, pts)
    np.testing.assert_allclose(
        d[:, 2], np.sqrt(5 / (16 * np.pi)) * (3 * z * z - r2), rtol=1e-12
    )


def test_radial_norm():
    # numerically verify the primitive norm for a few (l, alpha)
    r = np.linspace(0, 20, 200001)
    for l, a in [(0, 0.7), (1, 1.3), (2, 0.4), (3, 2.2)]:
        f = gaussian_radial_norm(l, a) * r**l * np.exp(-a * r * r)
        val = np.trapezoid(f * f * r * r, r)
        np.testing.assert_allclose(val, 1.0, rtol=1e-6)


def test_contraction_norm():
    exps = np.array([3.0, 0.8, 0.2])
    raw = np.array([0.3, 0.5, 0.4])
    c = normalize_contraction(1, exps, raw)
    r = np.linspace(0, 30, 400001)
    f = sum(ci * r * np.exp(-a * r * r) for ci, a in zip(c, exps))
    np.testing.assert_allclose(np.trapezoid(f * f * r * r, r), 1.0, rtol=1e-6)
