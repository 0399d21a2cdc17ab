"""Image simulation: spatially-varying blur + distortion + lateral color.

TPU-native counterpart of the reference pipeline
(`optiland/analysis/image_simulation/{engine,psf_basis_generator,simulator,
distortion_warper}.py`). The three stages map onto XLA-friendly batched
primitives:

  1. PSF basis (reference `psf_basis_generator.py:10`): one jitted vmap
     computes the FFT-PSF at every field point of a (ny, nx) grid in a single
     batched FFT, then an SVD extracts the top-K "eigen PSFs" and their
     field-coefficient maps.
  2. Spatially-variable convolution (reference `simulator.py:6`): the eigen
     decomposition turns the shift-variant blur into K+1 shift-INVARIANT
     convolutions — here one batched rFFT convolution over the (K+1) stack
     (MXU/fft work, no Python loop over pixels).
  3. Distortion warp (reference `distortion_warper.py:6`): trace a field
     grid, least-squares polynomial fit of (real image coords -> normalized
     source field), evaluate per destination pixel, bilinear resample via
     `jax.scipy.ndimage.map_coordinates`.

Lateral color falls out of running the stack once per wavelength channel.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from optiland_tpu.psf.fft import _pupil_grid, calculate_grid_size


# ---------------------------------------------------------------------------
# stage 1: PSF basis
# ---------------------------------------------------------------------------
class PSFBasisGenerator:
    """Eigen-PSF basis across the field (reference
    `psf_basis_generator.py:10-130`)."""

    def __init__(self, optic, wavelength, grid_shape=(5, 5), num_rays=64,
                 psf_grid_size=None, strategy: str = "chief_ray"):
        self.optic = optic
        self.wavelength = float(wavelength)
        self.grid_shape = grid_shape
        if psf_grid_size is None:
            num_rays, psf_grid_size = calculate_grid_size(num_rays)
        self.num_rays = num_rays
        self.psf_grid_size = psf_grid_size
        self.strategy = strategy

    def _compute_psf_grid(self):
        """(ny*nx, P, P) stack of sum-normalized PSFs over the field grid."""
        static, params = self.optic.build()
        ny, nx = self.grid_shape
        ys = np.linspace(-1.0, 1.0, ny)
        xs = np.linspace(-1.0, 1.0, nx)
        Hx = jnp.asarray([x for _y in ys for x in xs], params.cv.dtype)
        Hy = jnp.asarray([y for y in ys for _x in xs], params.cv.dtype)
        nr, gs, strat = self.num_rays, self.psf_grid_size, self.strategy
        wl = self.wavelength

        @jax.jit
        def compute(params, Hx, Hy):
            def one(hx, hy):
                pupil = _pupil_grid(static, params, hx, hy, wl, nr, strat)
                pad_b = (gs - nr) // 2
                pad_a = pad_b + (gs - nr) % 2
                padded = jnp.pad(pupil, ((pad_b, pad_a), (pad_b, pad_a)))
                amp = jnp.fft.fftshift(jnp.fft.fft2(padded))
                psf = jnp.real(amp * jnp.conj(amp))
                return psf / jnp.sum(psf)

            return jax.vmap(one)(Hx, Hy)

        return compute(params, Hx, Hy)

    def generate_basis(self, n_components=3):
        """Returns (eigen_psfs (K,P,P), coeff_grid (K,ny,nx), mean_psf (P,P));
        semantics of the reference's centered-SVD PCA
        (`psf_basis_generator.py:37-99`)."""
        stack = self._compute_psf_grid()
        n, h, w = stack.shape
        X = stack.reshape(n, h * w)
        mean_flat = jnp.mean(X, axis=0)
        Xc = X - mean_flat
        U, S, Vt = jnp.linalg.svd(Xc, full_matrices=False)
        eigen = Vt[:n_components].reshape(n_components, h, w)
        coeffs = (U[:, :n_components] * S[:n_components]).T.reshape(
            n_components, self.grid_shape[0], self.grid_shape[1])
        return eigen, coeffs, mean_flat.reshape(h, w)

    @staticmethod
    def resize_coefficient_map(coeff_map, target_shape):
        """Bilinear resize of (K, h, w) or (h, w) maps to target (H, W)."""
        cm = jnp.asarray(coeff_map)
        if cm.ndim == 3:
            out_shape = (cm.shape[0], target_shape[0], target_shape[1])
        else:
            out_shape = tuple(target_shape)
        return jax.image.resize(cm, out_shape, method="linear")


# ---------------------------------------------------------------------------
# stage 2: spatially-variable convolution
# ---------------------------------------------------------------------------
def _fftconvolve_same(image, kernels):
    """Batched 2-D FFT convolution, 'same' output (reference
    `be.fftconvolve(..., mode="same")`).

    image: (B, H, W); kernels: (B, P, P) -> (B, H, W). One rFFT each way.
    """
    B, H, W = image.shape
    P, Q = kernels.shape[-2:]
    fh, fw = H + P - 1, W + Q - 1
    Fi = jnp.fft.rfft2(image, s=(fh, fw))
    Fk = jnp.fft.rfft2(kernels, s=(fh, fw))
    full = jnp.fft.irfft2(Fi * Fk, s=(fh, fw))
    y0 = (P - 1) // 2
    x0 = (Q - 1) // 2
    return full[:, y0:y0 + H, x0:x0 + W]


class SpatiallyVariableSimulator:
    """Eigen-PSF shift-variant blur (reference `simulator.py:6-56`):
    out = src * mean_psf + sum_k (src . coeff_k) * eigen_k."""

    def simulate(self, source_image, eigen_psfs, coefficient_maps, mean_psf):
        src = jnp.asarray(source_image)
        eigen = jnp.asarray(eigen_psfs)
        cmaps = jnp.asarray(coefficient_maps)
        mean = jnp.asarray(mean_psf)

        images = jnp.concatenate([src[None], src[None] * cmaps], axis=0)
        kernels = jnp.concatenate([mean[None], eigen], axis=0)
        out = _fftconvolve_same(images, kernels)
        return jnp.sum(out, axis=0)


# ---------------------------------------------------------------------------
# stage 3: distortion warp
# ---------------------------------------------------------------------------
def _poly_features(x, y, degree):
    """[x^i y^j for i+j <= degree] feature matrix, (N, n_terms) — same term
    ordering as the reference (`distortion_warper.py:31-38`)."""
    feats = []
    for d in range(degree + 1):
        for i in range(d + 1):
            j = d - i
            feats.append((x ** i) * (y ** j))
    return jnp.stack(feats, axis=1)


class DistortionWarper:
    """Geometric distortion + lateral color warp (reference
    `distortion_warper.py:6-146`)."""

    def __init__(self, optic, source_fov=None):
        self.optic = optic
        if source_fov is None:
            mf = float(optic.fields.max_field)
            self.source_fov = (mf, mf)
        else:
            self.source_fov = source_fov

    def generate_distortion_map(self, wavelength, image_shape,
                                num_grid_points=25, degree=5):
        """(H, W, 2) normalized source coords (gx, gy in [-1, 1]) for each
        destination pixel, via a degree-`degree` polynomial LSQ fit of the
        traced chief-ray landing grid."""
        H, W = image_shape
        max_fx, max_fy = self.source_fov
        static, params = self.optic.build()

        lin = np.linspace(-1.0, 1.0, num_grid_points)
        gx, gy = np.meshgrid(lin, lin)
        gxf = jnp.asarray(gx.ravel(), params.cv.dtype)
        gyf = jnp.asarray(gy.ravel(), params.cv.dtype)

        optic_max = float(self.optic.fields.max_field)
        scale = 1.0 if optic_max == 0 else optic_max
        hx = gxf * (max_fx / scale)
        hy = gyf * (max_fy / scale)

        from optiland_tpu.trace.tracer import trace_system

        @jax.jit
        def land(params, hx, hy):
            hist = trace_system(static, params, hx, hy,
                                jnp.zeros_like(hx), jnp.zeros_like(hx),
                                jnp.full(hx.shape, wavelength, hx.dtype))
            return hist.x[-1], hist.y[-1]

        x_real, y_real = land(params, hx, hy)
        cx0, cy0 = land(params, jnp.zeros((1,), hx.dtype),
                        jnp.zeros((1,), hx.dtype))
        x_real = x_real - cx0[0]
        y_real = y_real - cy0[0]

        Xf = _poly_features(x_real, y_real, degree)
        c_gx = jnp.linalg.lstsq(Xf, gxf)[0]
        c_gy = jnp.linalg.lstsq(Xf, gyf)[0]

        min_x, max_x = jnp.min(x_real), jnp.max(x_real)
        min_y, max_y = jnp.min(y_real), jnp.max(y_real)
        ty = jnp.linspace(max_y, min_y, H)  # row 0 = top = +y
        tx = jnp.linspace(min_x, max_x, W)
        grid_x, grid_y = jnp.meshgrid(tx, ty)
        Xg = _poly_features(grid_x.ravel(), grid_y.ravel(), degree)
        tgx = (Xg @ c_gx).reshape(H, W)
        tgy = (Xg @ c_gy).reshape(H, W)
        return jnp.stack([tgx, tgy], axis=-1)

    def warp_image(self, image, distortion_grid):
        """Bilinear resample: each destination pixel pulls from the source at
        its normalized (gx, gy) — `map_coordinates` in place of torch
        grid_sample, zero padding outside."""
        img = jnp.asarray(image)
        squeeze = img.ndim == 2
        if squeeze:
            img = img[None]
        C, H, W = img.shape
        gxn = distortion_grid[..., 0]
        gyn = distortion_grid[..., 1]
        col = (gxn + 1.0) * 0.5 * (W - 1)
        row = (1.0 - gyn) * 0.5 * (H - 1)  # +gy (top of field) -> row 0

        def one(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch, [row, col], order=1, mode="constant", cval=0.0)

        out = jax.vmap(one)(img)
        return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------
class ImageSimulationEngine:
    """Full pipeline: pad/oversample -> per-channel eigen-PSF blur ->
    distortion warp -> crop (reference `engine.py:13-220`)."""

    def __init__(self, optic, source_image, config=None):
        self.optic = optic
        self.simulated_image = None

        img = jnp.asarray(source_image, jnp.float32)
        if img.ndim == 3 and img.shape[2] in (3, 4):
            img = jnp.transpose(img[:, :, :3], (2, 0, 1))
        elif img.ndim == 2:
            img = img[None, :, :]
        self.source_image = img

        self.config = {
            "wavelengths": [0.65, 0.55, 0.45],
            "psf_grid_shape": (5, 5),
            "psf_size": 128,
            "num_rays": 64,
            "n_components": 3,
            "oversample": 1,
            "padding": 64,
        }
        if config:
            self.config.update(config)

    def run(self):
        processed, pad_info = self._preprocess(self.source_image)
        C, H, W = processed.shape
        wavelengths = self.config["wavelengths"]
        if C == 1 and len(wavelengths) == 3:
            channels = [processed[0]] * 3
        else:
            channels = [processed[c] for c in range(min(C, len(wavelengths)))]

        out_channels = []
        for wave, channel in zip(wavelengths, channels):
            gen = PSFBasisGenerator(
                self.optic, wavelength=wave,
                grid_shape=self.config["psf_grid_shape"],
                num_rays=self.config["num_rays"],
                psf_grid_size=self.config["psf_size"],
            )
            eigen, coeffs, mean_psf = gen.generate_basis(
                n_components=self.config["n_components"])
            coeffs_hw = gen.resize_coefficient_map(coeffs, (H, W))

            blurred = SpatiallyVariableSimulator().simulate(
                channel, eigen, coeffs_hw, mean_psf)

            warper = DistortionWarper(self.optic)
            dist_map = warper.generate_distortion_map(wave, (H, W))
            out_channels.append(warper.warp_image(blurred, dist_map))

        result = self._postprocess(jnp.stack(out_channels, axis=0), pad_info)
        if result.ndim == 3:
            result = jnp.transpose(result, (1, 2, 0))
        self.simulated_image = result
        return result

    def view(self, force_rerun=False, figsize=(10, 5)):
        if self.simulated_image is None or force_rerun:
            self.run()
        import matplotlib.pyplot as plt

        src = self.source_image
        if src.shape[0] in (1, 3):
            src = jnp.transpose(src, (1, 2, 0))
        src_np = np.clip(np.asarray(src).squeeze(), 0, None)
        sim_np = np.clip(np.asarray(self.simulated_image).squeeze(), 0, None)
        if src_np.max() > 2.0:
            src_np = src_np / 255.0
        if sim_np.max() > 2.0:
            sim_np = sim_np / 255.0
        fig, ax = plt.subplots(1, 2, figsize=figsize)
        ax[0].imshow(np.clip(src_np, 0, 1),
                     cmap="gray" if src_np.ndim == 2 else None)
        ax[0].set_title("Original Image")
        ax[0].axis("off")
        ax[1].imshow(np.clip(sim_np, 0, 1),
                     cmap="gray" if sim_np.ndim == 2 else None)
        ax[1].set_title("Simulated Image")
        ax[1].axis("off")
        fig.tight_layout()
        return fig, ax

    def _preprocess(self, image):
        pad = self.config["padding"]
        padded = jnp.pad(image, ((0, 0), (pad, pad), (pad, pad)),
                         mode="reflect")
        scale = self.config["oversample"]
        if scale > 1:
            C, H, W = padded.shape
            padded = jax.image.resize(padded, (C, H * scale, W * scale),
                                      method="linear")
        return padded, (pad, scale)

    def _postprocess(self, image, pad_info):
        pad, scale = pad_info
        if scale > 1:
            C, H, W = image.shape
            image = jax.image.resize(image, (C, H // scale, W // scale),
                                     method="linear")
        th, tw = self.source_image.shape[-2:]
        crop = image[:, pad:pad + th, pad:pad + tw]
        return jnp.maximum(crop, 0.0)
