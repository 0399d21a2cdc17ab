"""Image simulation pipeline (reference
`optiland/analysis/image_simulation/{engine,psf_basis_generator,simulator,
distortion_warper}.py`)."""

import numpy as np
import pytest

import jax.numpy as jnp

import optiland_tpu  # noqa: F401
from optiland_tpu.analysis import (
    DistortionWarper,
    ImageSimulationEngine,
    PSFBasisGenerator,
    SpatiallyVariableSimulator,
)
from optiland_tpu.models import CookeTriplet


# ---------------------------------------------------------------------------
# stage 2: spatially-variable convolution — parity vs scipy fftconvolve
# (exactly what the reference's `be.fftconvolve(..., mode='same')` computes)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("P", [7, 8])
def test_simulator_matches_scipy_fftconvolve(P):
    from scipy.signal import fftconvolve

    rng = np.random.default_rng(0)
    H, W, K = 24, 31, 3
    src = rng.uniform(size=(H, W))
    eigen = rng.normal(size=(K, P, P))
    cmaps = rng.uniform(size=(K, H, W))
    mean = rng.uniform(size=(P, P))

    # reference algorithm (simulator.py:46-56) on numpy
    want = fftconvolve(src, mean, mode="same")
    for k in range(K):
        want = want + fftconvolve(src * cmaps[k], eigen[k], mode="same")

    got = SpatiallyVariableSimulator().simulate(src, eigen, cmaps, mean)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-9)


def test_simulator_delta_psf_identity():
    """A delta-function mean PSF with zero eigen components is a no-op."""
    rng = np.random.default_rng(1)
    src = rng.uniform(size=(16, 16))
    mean = np.zeros((5, 5))
    mean[2, 2] = 1.0
    eigen = np.zeros((2, 5, 5))
    cmaps = np.zeros((2, 16, 16))
    got = SpatiallyVariableSimulator().simulate(src, eigen, cmaps, mean)
    np.testing.assert_allclose(np.asarray(got), src, atol=1e-10)


# ---------------------------------------------------------------------------
# stage 1: PSF basis
# ---------------------------------------------------------------------------
def test_psf_basis_reconstruction():
    """Full-rank eigen decomposition reconstructs every grid PSF exactly
    (the PCA identity the reference's SVD guarantees,
    `psf_basis_generator.py:37-99`)."""
    lens = CookeTriplet()
    gen = PSFBasisGenerator(lens, wavelength=0.55, grid_shape=(3, 3),
                            num_rays=32, psf_grid_size=64)
    stack = np.asarray(gen._compute_psf_grid())
    assert stack.shape == (9, 64, 64)
    # PSFs are sum-normalized
    np.testing.assert_allclose(stack.sum(axis=(1, 2)), 1.0, rtol=1e-5)

    eigen, coeffs, mean = gen.generate_basis(n_components=9)
    eigen = np.asarray(eigen)
    coeffs = np.asarray(coeffs).reshape(9, 9)
    mean = np.asarray(mean)
    recon = mean[None] + np.einsum("kn,kij->nij",
                                   coeffs, eigen).reshape(9, 64, 64)
    # full rank -> exact reconstruction
    np.testing.assert_allclose(recon.reshape(9, -1),
                               stack.reshape(9, -1), atol=1e-8)


def test_coefficient_map_resize():
    cm = jnp.arange(12.0).reshape(2, 2, 3)
    out = PSFBasisGenerator.resize_coefficient_map(cm, (8, 9))
    assert out.shape == (2, 8, 9)
    # corners preserved by bilinear resize
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# stage 3: distortion warp
# ---------------------------------------------------------------------------
def test_warp_identity_grid():
    """An identity distortion grid reproduces the source image."""
    rng = np.random.default_rng(2)
    H, W = 12, 17
    img = rng.uniform(size=(H, W))
    gy, gx = np.meshgrid(np.linspace(1, -1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    grid = np.stack([gx, gy], axis=-1)
    lens = CookeTriplet()
    out = DistortionWarper(lens).warp_image(img, jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def test_distortion_map_shape_and_center():
    lens = CookeTriplet()
    warper = DistortionWarper(lens)
    grid = np.asarray(warper.generate_distortion_map(0.55, (16, 16),
                                                     num_grid_points=9,
                                                     degree=3))
    assert grid.shape == (16, 16, 2)
    assert np.all(np.isfinite(grid))
    # the map spans the normalized field both ways
    assert grid[..., 0].min() < -0.5 and grid[..., 0].max() > 0.5
    assert grid[..., 1].min() < -0.5 and grid[..., 1].max() > 0.5


# ---------------------------------------------------------------------------
# the engine, end to end
# ---------------------------------------------------------------------------
def test_engine_end_to_end():
    lens = CookeTriplet()
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(32, 32)).astype(np.float32)
    eng = ImageSimulationEngine(lens, img, config={
        "wavelengths": [0.55],
        "psf_grid_shape": (3, 3),
        "psf_size": 64,
        "num_rays": 32,
        "n_components": 2,
        "padding": 16,
    })
    out = np.asarray(eng.run())
    assert out.shape[:2] == (32, 32)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0
    assert out.max() > 0.0
