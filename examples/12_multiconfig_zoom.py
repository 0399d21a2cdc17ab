"""Multi-configuration (zoom) systems (reference Tutorial_7f): one base
prescription, several configurations with unlinked parameters, and
cross-configuration pickups keeping shared parameters in sync."""

import numpy as np

from optiland_tpu.models import CookeTriplet
from optiland_tpu.system.multiconfig import MultiConfiguration


def main():
    base = CookeTriplet()
    mc = MultiConfiguration(base)
    # config 2 refocuses: only the image gap is unlinked from the base
    cfg2 = mc.add_configuration(unlink=((6, "thickness"),))
    cfg2.set_thickness(45.0, 6)
    mc.update()

    for k, cfg in enumerate(mc.configurations):
        hist = cfg.trace(Hx=0.0, Hy=0.0, num_rays=16)
        x, y = np.asarray(hist.x[-1]), np.asarray(hist.y[-1])
        print(f"config {k}: f2 = {float(cfg.paraxial.f2()):.4f} mm, "
              f"rms spot = {np.sqrt(np.mean((x - x.mean())**2 + (y - y.mean())**2)):.3e} mm")

    # shared parameters stay linked: change R1 on the base, update, and
    # every configuration follows
    base.set_radius(22.5, 1)
    mc.update()
    f2s = [float(c.paraxial.f2()) for c in mc.configurations]
    print("after base R1 change, f2 per config:",
          [f"{v:.4f}" for v in f2s])
    assert np.isclose(f2s[0], f2s[1])
    return f2s


if __name__ == "__main__":
    main()
