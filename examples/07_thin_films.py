"""Thin-film design (reference Tutorial_6c/6d/6h): a quarter-wave AR
stack, R/T spectra from the TMM core, gradient optimization of layer
thicknesses, and needle synthesis."""

import numpy as np

from optiland_tpu.thin_film import (
    NeedleSynthesis,
    ThinFilmOptimizer,
    ThinFilmStack,
)


def main():
    # two-layer V-coat start: high/low index on glass
    stack = ThinFilmStack(incident_material="air", substrate_material=1.52)
    stack.add_layer(2.35, 0.020)   # TiO2-ish
    stack.add_layer(1.38, 0.090)   # MgF2-ish

    wl = np.linspace(450, 650, 21)
    R0 = np.asarray([float(np.asarray(stack.reflectance_nm_deg(w)))
                     for w in wl])
    print(f"start: mean R over 450-650nm = {R0.mean() * 100:.2f}%")

    opt = ThinFilmOptimizer(stack)
    for k in range(len(stack.layers)):
        opt.add_variable(k, min_nm=5.0, max_nm=500.0)
    for w in (500.0, 550.0, 600.0):
        opt.add_operand(property="R", wavelength_nm=w, target_type="equal",
                        value=0.0, polarization="u")
    opt.optimize(max_iter=150)

    R1 = np.asarray([float(np.asarray(stack.reflectance_nm_deg(w)))
                     for w in wl])
    print(f"optimized: mean R = {R1.mean() * 100:.3f}%  "
          f"(layers: {[f'{float(np.asarray(l.thickness_um)) * 1e3:.1f}nm' for l in stack.layers]})")

    # needle synthesis: insert thin high-index needle layers where they
    # most improve a broadband AR merit
    needle = NeedleSynthesis(stack, needle_material=2.35,
                             positions_per_layer=3, max_needles=2)
    needle.add_target("R", wavelength_nm=list(wl[::4]),
                      target_type="equal", value=0.0)
    res = needle.run(max_iterations=2)
    print(f"after needles: {len(res.stack.layers)} layers, "
          f"merit {res.merit_history[0]:.3e} -> {res.final_merit:.3e}")
    return res


if __name__ == "__main__":
    main()
