"""Round-4 additions: BestFitRayFan, named AngleVsHeight variants, and the
TPU complex-dtype policy (complex128 is unsupported on TPU hardware —
`config.complex_dtype`/`phase_dtype`/`imag_unit` keep the wave-optics paths
at complex64 there while preserving complex128 parity on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from optiland_tpu import config
from optiland_tpu.models import CookeTriplet


# ---------------------------------------------------------------------------
# complex dtype policy
# ---------------------------------------------------------------------------
def test_complex_dtype_follows_precision():
    # suite runs on CPU in float64 parity mode: full-width complex
    assert config.complex_dtype() == jnp.complex128
    assert config.phase_dtype() == jnp.float64
    assert config.imag_unit().dtype == jnp.complex128
    try:
        config.set_precision("float32")
        assert config.complex_dtype() == jnp.complex64
        assert config.phase_dtype() == jnp.float32
        assert config.imag_unit().dtype == jnp.complex64
    finally:
        config.set_precision("float64")


def test_sampled_mtf_pupil_dtype_matches_policy():
    from optiland_tpu.mtf import SampledMTF

    lens = CookeTriplet()
    m = SampledMTF(lens, field=(0.0, 0.0), num_rays=16)
    assert m.P1.dtype == config.complex_dtype()


def test_jones_and_prt_dtype_matches_policy():
    from optiland_tpu.polarization import jones
    from optiland_tpu.polarization.prt import identity_prt

    k = jnp.asarray([[0.0, 0.0, 1.0]])
    J = jones.right_circular_polarizer(k, k) if hasattr(
        jones, "right_circular_polarizer") else jones._assemble(
        1.0, 0.0, 0.0, 1.0, 1.0, 1)
    assert J.dtype == config.complex_dtype()
    assert identity_prt(3).dtype == config.complex_dtype()


# ---------------------------------------------------------------------------
# BestFitRayFan
# ---------------------------------------------------------------------------
def test_best_fit_ray_fan_on_axis_matches_rayfan():
    """On-axis, the best-fit sphere center sits on the axis, so the fan
    matches the chief-centered RayFan."""
    from optiland_tpu.analysis import BestFitRayFan, RayFan

    lens = CookeTriplet()
    bf = BestFitRayFan(lens, fields=[(0.0, 0.0)], num_points=33,
                       num_rays_for_fit=6)
    rf = RayFan(lens, fields=[(0.0, 0.0)], num_points=33)
    np.testing.assert_allclose(np.asarray(bf.data["ey"]),
                               np.asarray(rf.data["ey"]), atol=1e-9)


def test_best_fit_ray_fan_off_axis_uses_sphere_center():
    """Off-axis the reference point is the best-fit sphere center's lateral
    (x, y) — the fan is the raw image intersection minus that center, and
    the aberration *shape* matches the chief-centered RayFan up to the
    constant offset (reference BestFitRayFan docstring)."""
    from optiland_tpu.analysis import BestFitRayFan, RayFan
    from optiland_tpu.core.distributions import generate
    from optiland_tpu.wavefront.core import wavefront_data

    lens = CookeTriplet()
    bf = BestFitRayFan(lens, fields=[(0.0, 1.0)], wavelengths="primary",
                       num_points=33, num_rays_for_fit=6)
    rf = RayFan(lens, fields=[(0.0, 1.0)], wavelengths="primary",
                num_points=33)
    ey_bf = np.asarray(bf.data["ey"][0, 0])
    ey_rf = np.asarray(rf.data["ey"][0, 0])
    live = np.asarray(bf.data["intensity_y"][0, 0]) > 0
    c = 33 // 2
    assert abs(ey_rf[c]) < 1e-10  # chief-centered passes through 0
    # the offset applied must be exactly the best-fit sphere center's y
    static, params = lens.build()
    Px, Py = generate("hexapolar", 6)
    args = (static, params, 0.0, 1.0,
            jnp.asarray(Px, params.cv.dtype),
            jnp.asarray(Py, params.cv.dtype),
            jnp.asarray(lens.primary_wavelength, params.cv.dtype))
    best = wavefront_data(*args, strategy="best_fit")
    chief = wavefront_data(*args, strategy="chief_ray")
    # chief-strategy center IS the chief-ray hit, so the center fan ray sits
    # at (chief hit - best-fit center) in the best-fit-referenced fan
    np.testing.assert_allclose(
        ey_bf[c],
        float(np.asarray(chief.center[1] - best.center[1])), atol=1e-9)
    # aberration shape matches up to the constant offset
    np.testing.assert_allclose(ey_bf[live] - ey_bf[c],
                               ey_rf[live] - ey_rf[c], atol=1e-9)


def test_best_fit_ray_fan_parity_with_reference(reference):
    """Best-fit sphere center (x, y) vs the mounted reference's
    BestFitSphereStrategy on the same Cooke triplet."""
    import optiland.analysis as ref
    from optiland.samples.objectives import CookeTriplet as RefCooke

    from optiland_tpu.analysis import BestFitRayFan

    lens = CookeTriplet()
    bf = BestFitRayFan(lens, num_points=17, num_rays_for_fit=6)
    ref_fan = ref.BestFitRayFan(RefCooke(), num_points=17,
                                num_rays_for_fit=6)
    for fi, field in enumerate(bf.fields):
        for wi, w in enumerate(bf.wavelengths):
            ref_ey = np.asarray(ref_fan.data[f"{field}"][f"{w}"]["y"])
            ey = np.asarray(bf.data["ey"][fi, wi])
            live = np.asarray(bf.data["intensity_y"][fi, wi]) > 0
            np.testing.assert_allclose(ey[live], ref_ey[live], atol=5e-4)


# ---------------------------------------------------------------------------
# named AngleVsHeight variants
# ---------------------------------------------------------------------------
def test_pupil_and_field_angle_vs_height():
    from optiland_tpu.analysis import (
        AngleVsHeight,
        FieldIncidentAngleVsHeight,
        PupilIncidentAngleVsHeight,
    )

    lens = CookeTriplet()
    p = PupilIncidentAngleVsHeight(lens, num_points=16)
    base_p = AngleVsHeight(lens, num_points=16, scan="pupil")
    np.testing.assert_allclose(p.data["angle"], base_p.data["angle"])
    f = FieldIncidentAngleVsHeight(lens, num_points=16)
    base_f = AngleVsHeight(lens, num_points=16, scan="field")
    np.testing.assert_allclose(f.data["angle"], base_f.data["angle"])
    # pupil sweep at fixed off-axis field differs from the on-axis default
    p2 = PupilIncidentAngleVsHeight(lens, num_points=16, Hy=1.0)
    assert not np.allclose(p.data["angle"], p2.data["angle"])
