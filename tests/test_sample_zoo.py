"""Whole-sample-zoo parity: every prebuilt model traces identically to its
reference counterpart (reference `optiland/samples/*.py`)."""

import numpy as np
import pytest

import jax

import optiland_tpu.models as models


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """The wide-FOV robust-aiming jits produce executables large enough to
    segfault PJRT's serialize/deserialize inside the persistent compilation
    cache (observed twice at exactly this module, on both the read and the
    write path). Recompiling here is cheaper than crashing the suite."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)

# (our name, reference module, reference name)
ZOO = [
    ("TripletTelescopeObjective", "objectives", "TripletTelescopeObjective"),
    ("ObjectiveUS008879901", "objectives", "ObjectiveUS008879901"),
    ("TelescopeObjective48Inch", "objectives", "TelescopeObjective48Inch"),
    ("HeliarLens", "objectives", "HeliarLens"),
    ("TessarLens", "objectives", "TessarLens"),
    ("LensWithFieldCorrector", "objectives", "LensWithFieldCorrector"),
    ("PetzvalLens", "objectives", "PetzvalLens"),
    ("Telephoto", "objectives", "Telephoto"),
    ("WideAngle100FOV", "objectives", "WideAngle100FOV"),
    ("ProjectionLens120FOV", "objectives", "ProjectionLens120FOV"),
    ("ProjectionLens160FOV", "objectives", "ProjectionLens160FOV"),
    ("WideAngle170FOV", "objectives", "WideAngle170FOV"),
    ("EyepieceErfle", "eyepieces", "EyepieceErfle"),
    ("InfraredTriplet", "infrared", "InfraredTriplet"),
    ("InfraredTripletF4", "infrared", "InfraredTripletF4"),
    ("UVProjectionLens", "lithography", "UVProjectionLens"),
    ("Objective60x", "microscopes", "Objective60x"),
    ("Microscope20x", "microscopes", "Microscope20x"),
    ("UVReflectingMicroscope", "microscopes", "UVReflectingMicroscope"),
    ("NavarroWideAngleEye", "miscellaneous", "NavarroWideAngleEye"),
    ("Edmund_49_847", "simple", "Edmund_49_847"),
    ("SingletStopSurf2", "simple", "SingletStopSurf2"),
    ("TelescopeDoublet", "simple", "TelescopeDoublet"),
    ("CementedAchromat", "simple", "CementedAchromat"),
    ("AsphericSinglet", "simple", "AsphericSinglet"),
    ("HubbleTelescope", "telescopes", "HubbleTelescope"),
]


@pytest.mark.parametrize("ours,ref_mod,theirs", ZOO,
                         ids=[z[0] for z in ZOO])
def test_zoo_trace_parity(reference, ours, ref_mod, theirs):
    import importlib

    ref_cls = getattr(importlib.import_module(f"optiland.samples.{ref_mod}"),
                      theirs)
    got_cls = getattr(models, ours)
    ref = ref_cls()
    got = got_cls()

    # first-order parity
    np.testing.assert_allclose(float(got.paraxial.f2()),
                               float(np.asarray(ref.paraxial.f2())),
                               rtol=1e-8)

    # full-field real-trace parity
    w = ref.primary_wavelength
    r = ref.trace(Hx=0.0, Hy=1.0, wavelength=w, num_rays=6,
                  distribution="hexapolar")
    h = got.trace(Hx=0.0, Hy=1.0, wavelength=w, num_rays=6,
                  distribution="hexapolar")
    ref_y = np.asarray(r.y)
    got_y = np.asarray(h.y[-1])
    ref_i = np.asarray(r.i)
    got_i = np.asarray(h.intensity[-1])
    live = (ref_i > 0) & (got_i > 0)
    np.testing.assert_array_equal(ref_i > 0, got_i > 0, err_msg=ours)
    # regression: the full-field trace must keep at least as many rays
    # live as the reference does (VERDICT r2 item 2 done-criterion; the
    # wide-angle lenses once lost all 127 to aimer divergence). An absolute
    # threshold is wrong for systems whose REFERENCE legitimately vignettes
    # rays (UVReflectingMicroscope's central obscuration kills ~8%).
    assert (got_i > 0).mean() >= min(0.95, (ref_i > 0).mean()), \
        f"{ours}: live fraction too low"
    # iterative/robust-aimed samples: the aimed ray is the unique ray
    # hitting (Px, Py) * r_stop at the stop, so position agreement is
    # bounded by each aimer's CONVERGENCE — and on extreme-FOV lenses the
    # reference's recursive aimer stops short (measured 3.3e-3 median
    # normalized stop residual on WideAngle170FOV vs our 5e-14). Assert we
    # aim at least as accurately as the reference, then compare positions
    # with a tolerance scaled to the reference's own residual.
    aimed = got.ray_aiming != "paraxial"
    if aimed:
        from optiland_tpu.trace.aiming import stop_radius

        static, params = got.build()
        stop = static.stop_index
        r_stop = float(stop_radius(static, params, w))
        from optiland.distribution import create_distribution

        d = create_distribution("hexapolar")
        d.generate_points(6)
        Px, Py = np.asarray(d.x), np.asarray(d.y)

        def resid(sx, sy):
            e = np.hypot(sx / r_stop - Px, sy / r_stop - Py)
            return e[live]

        ref_err = resid(np.asarray(ref.surfaces.x[stop]),
                        np.asarray(ref.surfaces.y[stop]))
        got_err = resid(np.asarray(h.x[stop]), np.asarray(h.y[stop]))
        assert np.max(got_err) <= max(np.max(ref_err), 1e-6) + 1e-9, \
            f"{ours}: our aimer converged worse than the reference"
        rtol = max(1e-4, 5.0 * float(np.max(ref_err)))
        atol = max(3e-5, 0.3 * rtol)
    else:
        atol = 1e-9
        rtol = 1e-7
    np.testing.assert_allclose(got_y[live], ref_y[live],
                               rtol=rtol, atol=atol, err_msg=ours)
