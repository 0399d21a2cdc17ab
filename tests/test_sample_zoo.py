"""Whole-sample-zoo parity: every prebuilt model traces identically to its
reference counterpart (reference `optiland/samples/*.py`)."""

import numpy as np
import pytest

import optiland_tpu.models as models

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
    # regression: full-field trace must keep >=95% of rays live on every
    # zoo lens (VERDICT r2 item 2 done-criterion; the wide-angle lenses
    # once lost all 127 to aimer divergence)
    assert (got_i > 0).mean() >= 0.95, f"{ours}: live fraction too low"
    # iterative/robust-aimed samples agree to the aim tolerance (the
    # reference's per-ray Newton stops at 1e-6); the rest to float precision
    aimed = got.ray_aiming != "paraxial"
    atol = 3e-5 if aimed else 1e-9
    rtol = 1e-4 if aimed else 1e-7
    np.testing.assert_allclose(got_y[live], ref_y[live],
                               rtol=rtol, atol=atol, err_msg=ours)
