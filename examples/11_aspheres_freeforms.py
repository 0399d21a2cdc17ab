"""Aspheres and freeform surfaces (reference Tutorial_2d/7c): an even
asphere singlet, a Chebyshev freeform surface, and gradients through the
freeform coefficients (every geometry in the zoo is differentiable)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu import Optic
from optiland_tpu.models import AsphericSinglet
from optiland_tpu.trace.tracer import trace_system_final


def freeform_singlet() -> Optic:
    lens = Optic()
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material=1.52,
                     is_stop=True, surface_type="chebyshev",
                     coefficients=[[0.0, 1e-5], [2e-5, 0.0]],
                     norm_x=10.0, norm_y=10.0)
    lens.add_surface(index=2, radius=-50.0, thickness=47.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(y=0)
    lens.add_wavelength(0.55, is_primary=True)
    return lens


def main():
    asph = AsphericSinglet()
    hist = asph.trace(Hx=0.0, Hy=0.0, num_rays=32)
    x, y = np.asarray(hist.x[-1]), np.asarray(hist.y[-1])
    print(f"aspheric singlet rms spot = {np.sqrt(np.mean((x - x.mean())**2 + (y - y.mean())**2)):.3e} mm")

    lens = freeform_singlet()
    static, params = lens.build()
    n = 16
    px = jnp.linspace(-0.9, 0.9, n)

    def spot_y_spread(p):
        out = trace_system_final(static, p, jnp.zeros(n), jnp.zeros(n),
                                 jnp.zeros(n), px, jnp.full(n, 0.55))
        return jnp.std(out["y"])

    g = jax.grad(spot_y_spread)(params)
    print("d(spot spread)/d(chebyshev coeffs), surface 1:")
    print(np.array2string(np.asarray(g.coeffs[1][:4]), precision=3))
    return g


if __name__ == "__main__":
    main()
