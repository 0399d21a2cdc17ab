"""Build a Cooke triplet from scratch, inspect paraxial properties, trace
rays, and draw a spot diagram (reference Tutorial_1a/1b/2a)."""

import numpy as np

from _common import maybe_save
from optiland_tpu import Optic
from optiland_tpu.analysis import SpotDiagram
from optiland_tpu.visualization import OpticViewer


def build_lens() -> Optic:
    lens = Optic()
    lens.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    lens.surfaces.add(index=1, radius=22.01359, thickness=3.25896,
                      material="SK16")
    lens.surfaces.add(index=2, radius=-435.76044, thickness=6.00755)
    lens.surfaces.add(index=3, radius=-22.21328, thickness=0.99997,
                      material=("F2", "schott"))
    lens.surfaces.add(index=4, radius=20.29192, thickness=4.75041,
                      is_stop=True)
    lens.surfaces.add(index=5, radius=79.68360, thickness=2.95208,
                      material="SK16")
    lens.surfaces.add(index=6, radius=-18.39533, thickness=42.20778)
    lens.surfaces.add(index=7)
    lens.set_aperture(aperture_type="EPD", value=10)
    lens.fields.set_type(field_type="angle")
    lens.fields.add(y=0)
    lens.fields.add(y=14)
    lens.fields.add(y=20)
    lens.wavelengths.add(value=0.48)
    lens.wavelengths.add(value=0.55, is_primary=True)
    lens.wavelengths.add(value=0.65)
    return lens


def main(num_rings: int = 6):
    lens = build_lens()

    print(f"EFL        f2  = {float(lens.paraxial.f2()):.4f} mm")
    print(f"F-number  FNO  = {float(lens.paraxial.FNO()):.4f}")
    print(f"Entrance pupil = {float(lens.paraxial.EPD()):.4f} mm "
          f"at z = {float(lens.paraxial.EPL()):.4f}")

    # real-ray trace of the on-axis field at the primary wavelength
    hist = lens.trace(Hx=0.0, Hy=0.0, num_rays=32, distribution="hexapolar")
    x, y = np.asarray(hist.x[-1]), np.asarray(hist.y[-1])
    print(f"on-axis image-plane spot: {x.size} rays, "
          f"rms radius = {np.sqrt(np.mean((x - x.mean())**2 + (y - y.mean())**2)):.3e} mm")

    spot = SpotDiagram(lens, num_rings=num_rings)
    rms = np.asarray(spot.rms_spot_radius())
    print("RMS spot radius (fields x wavelengths):")
    print(np.array2string(rms, precision=5))

    fig, _ = OpticViewer(lens).view(num_rays=5)
    maybe_save(fig, "01_layout.png")
    return rms


if __name__ == "__main__":
    main()
