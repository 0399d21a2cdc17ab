"""Aberration analyses (reference Tutorial_3a/3b/3c): Seidel third-order
sums, chromatic aberrations, transverse ray fans, field curvature, and
distortion on the Cooke triplet."""

import numpy as np

from _common import maybe_save
from optiland_tpu.analysis import Distortion, FieldCurvature, RayFan
from optiland_tpu.models import CookeTriplet
from optiland_tpu.system import aberrations as ab


def main():
    lens = CookeTriplet()
    static, params = lens.build()

    S = np.asarray(ab.seidels(static, params))
    print("Seidel sums  [SI..SV]:", np.array2string(S, precision=5))
    print(f"axial  chromatic LchC = {float(np.sum(np.asarray(ab.LchC(static, params)))):+.5f}")
    print(f"lateral chromatic TchC = {float(np.sum(np.asarray(ab.TchC(static, params)))):+.5f}")

    fan = RayFan(lens, num_points=17)
    print("ray-fan max |ey| per field:",
          [f"{np.nanmax(np.abs(np.asarray(d))):.4e}"
           for d in fan.data["ey"]] if isinstance(fan.data, dict) else "see .view()")

    fc = FieldCurvature(lens, num_points=16)
    dist = Distortion(lens, num_points=16)
    print(f"max field curvature  = {np.nanmax(np.abs(np.asarray(fc.data))):.4f} mm")
    print(f"max distortion       = {np.nanmax(np.abs(np.asarray(dist.data))):.4f} %")

    for obj, name in ((fan, "04_rayfan.png"), (fc, "04_field_curv.png"),
                      (dist, "04_distortion.png")):
        out = obj.view()
        fig = out[0] if isinstance(out, tuple) else out
        maybe_save(fig, name)
    return S


if __name__ == "__main__":
    main()
