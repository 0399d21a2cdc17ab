"""Image simulation (reference `analysis/image_simulation/`): a PSF basis
grid across the field, PCA compression, spatially-variable convolution of
a source image, and the distortion warp — all as one batched XLA graph."""

import numpy as np

from optiland_tpu.analysis import ImageSimulationEngine
from optiland_tpu.models import CookeTriplet


def main(size: int = 48):
    lens = CookeTriplet()
    # synthetic source: a grid of bright points on a gray background
    img = np.full((size, size), 0.1, np.float32)
    img[::8, ::8] = 1.0

    eng = ImageSimulationEngine(lens, img, config={
        "wavelengths": [0.55],
        "psf_grid_shape": (3, 3),
        "psf_size": 64,
        "num_rays": 32,
        "n_components": 3,
        "padding": 16,
    })
    out = np.asarray(eng.run())
    print(f"simulated image: {out.shape}, "
          f"dynamic range {out.min():.4f}..{out.max():.4f}")
    # the PSF blurs the unit impulses: peak energy must spread
    assert out.max() < img.max()
    return out


if __name__ == "__main__":
    main()
