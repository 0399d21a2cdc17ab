"""Coatings and polarization (reference Tutorial_6a/6b): a singlet with
Fresnel coatings traced with a polarized source, transmitted intensity vs
polarization state, and the Jones pupil of the Cooke triplet."""

import numpy as np

from _common import maybe_save
from optiland_tpu import Optic
from optiland_tpu.analysis import JonesPupil
from optiland_tpu.models import CookeTriplet
from optiland_tpu.polarization import PolarizationState


def coated_singlet() -> Optic:
    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                     is_stop=True, coating="fresnel")
    lens.add_surface(index=2, radius=-50.0, thickness=47.0, coating="fresnel")
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=20)
    lens.fields.set_type(field_type="angle")
    lens.fields.add(y=0)
    lens.wavelengths.add(value=0.55, is_primary=True)
    return lens


def main():
    lens = coated_singlet()
    for label, state in (
            ("unpolarized", "unpolarized"),
            ("linear x", PolarizationState(True, 1.0, 0.0, 0.0, 0.0)),
            ("circular", PolarizationState(True, 1 / np.sqrt(2),
                                           1 / np.sqrt(2), 0.0, np.pi / 2))):
        lens.set_polarization(state)
        hist = lens.trace(Hx=0.0, Hy=0.0, num_rays=24)
        i = np.asarray(hist.intensity[-1])
        print(f"{label:12s}: mean transmitted intensity = "
              f"{i[i > 0].mean():.5f}")

    jp = JonesPupil(CookeTriplet(), field=(0, 1.0), grid_size=16)
    out = jp.view()
    fig = out[0] if isinstance(out, tuple) else out
    maybe_save(fig, "06_jones_pupil.png")


if __name__ == "__main__":
    main()
