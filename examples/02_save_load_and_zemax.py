"""Save/load systems: optiland-compatible JSON round-trip plus Zemax and
CODE V export/import (reference Tutorial_1c; fileio parity with
`optiland/fileio/`)."""

import tempfile

import numpy as np

from optiland_tpu.fileio import (
    load_codev_file,
    load_optiland_file,
    load_zemax_file,
    save_codev_file,
    save_optiland_file,
    save_zemax_file,
)
from optiland_tpu.models import CookeTriplet


def main():
    lens = CookeTriplet()
    f2 = float(lens.paraxial.f2())

    with tempfile.TemporaryDirectory() as d:
        # optiland JSON schema — files written by the reference load here
        # and vice versa
        save_optiland_file(lens, f"{d}/cooke.json")
        back = load_optiland_file(f"{d}/cooke.json")
        print(f"JSON round-trip: f2 {f2:.6f} -> "
              f"{float(back.paraxial.f2()):.6f}")
        assert np.isclose(float(back.paraxial.f2()), f2)

        save_zemax_file(lens, f"{d}/cooke.zmx")
        zmx = load_zemax_file(f"{d}/cooke.zmx")
        print(f"Zemax round-trip: f2 -> {float(zmx.paraxial.f2()):.6f}")

        save_codev_file(lens, f"{d}/cooke.seq")
        seq = load_codev_file(f"{d}/cooke.seq")
        print(f"CODE V round-trip: f2 -> {float(seq.paraxial.f2()):.6f}")
    return f2


if __name__ == "__main__":
    main()
