"""Extended sources: ray bundles generated at a source plane and traced
through an Optic (reference `optiland/sources/base.py`,
`optic/extended_source_optic.py:24`)."""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu.core.rays import Rays


class BaseSource:
    """A ray-bundle generator positioned in global space."""

    def __init__(self, position=(0.0, 0.0, 0.0)):
        self.position = tuple(float(v) for v in position)

    def generate_rays(self, num_rays: int) -> Rays:
        raise NotImplementedError

    def _globalize(self, rays: Rays) -> Rays:
        px, py, pz = self.position
        return rays.replace(x=rays.x + px, y=rays.y + py, z=rays.z + pz)


def trace_source(optic, source: BaseSource, num_rays: int):
    """Trace source-generated rays through the optic (the reference's
    ExtendedSourceOptic.trace)."""
    from optiland_tpu.trace.tracer import trace_rays

    static, params = optic.build()
    rays = source.generate_rays(num_rays)
    rays = rays.replace(
        **{k: jnp.asarray(getattr(rays, k), params.cv.dtype)
           for k in ("x", "y", "z", "L", "M", "N", "i", "opd", "w")}
    )
    return trace_rays(static, params, rays)
