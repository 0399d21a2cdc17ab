"""Physical aperture zoo + environment air-index model parity tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from optiland_tpu.system.apertures import (
    DifferenceAperture,
    EllipticalAperture,
    IntersectionAperture,
    OffsetRadialAperture,
    PolygonAperture,
    RadialAperture,
    RectangularAperture,
    UnionAperture,
)


def _grid(n=41, scale=3.0):
    v = np.linspace(-scale, scale, n)
    X, Y = np.meshgrid(v, v)
    return X.ravel(), Y.ravel()


@pytest.mark.parametrize("mine,make_ref", [
    (RadialAperture(2.0, 0.5),
     lambda m: m.RadialAperture(r_max=2.0, r_min=0.5)),
    (OffsetRadialAperture(1.5, 0.2, 0.7, -0.4),
     lambda m: m.OffsetRadialAperture(r_max=1.5, r_min=0.2, offset_x=0.7,
                                      offset_y=-0.4)),
    (EllipticalAperture(2.0, 1.0, 0.3, 0.1),
     lambda m: m.EllipticalAperture(a=2.0, b=1.0, offset_x=0.3,
                                    offset_y=0.1)),
    (RectangularAperture(-1.0, 2.0, -0.5, 1.5),
     lambda m: m.RectangularAperture(x_min=-1.0, x_max=2.0, y_min=-0.5,
                                     y_max=1.5)),
])
def test_aperture_contains_parity(reference, mine, make_ref):
    import optiland.physical_apertures as pa

    ref = make_ref(pa)
    x, y = _grid()
    want = np.asarray(ref.contains(x, y))
    got = np.asarray(mine.contains(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_array_equal(got, want)


def test_polygon_aperture_parity(reference):
    import optiland.physical_apertures as pa

    xs = (0.0, 2.0, 2.5, 1.0, -1.5)
    ys = (-1.0, -0.8, 1.2, 2.5, 0.5)
    ref = pa.PolygonAperture(list(xs), list(ys))
    mine = PolygonAperture(xs, ys)
    x, y = _grid(n=61)
    want = np.asarray(ref.contains(x, y))
    got = np.asarray(mine.contains(jnp.asarray(x), jnp.asarray(y)))
    # boundary pixels may differ by rule; require > 99.9% agreement and
    # exact agreement away from edges
    assert (got == want).mean() > 0.999


def test_boolean_apertures_parity(reference):
    import optiland.physical_apertures as pa

    a = RadialAperture(2.0)
    b = RectangularAperture(0.0, 3.0, 0.0, 3.0)
    ra = pa.RadialAperture(r_max=2.0)
    rb = pa.RectangularAperture(x_min=0.0, x_max=3.0, y_min=0.0, y_max=3.0)
    x, y = _grid()
    for mine, ref in [
        (UnionAperture(a, b), pa.UnionAperture(ra, rb)),
        (IntersectionAperture(a, b), pa.IntersectionAperture(ra, rb)),
        (DifferenceAperture(a, b), pa.DifferenceAperture(ra, rb)),
        (a | b, ra | rb), (a & b, ra & rb), (a - b, ra - rb),
    ]:
        want = np.asarray(ref.contains(x, y))
        got = np.asarray(mine.contains(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_array_equal(got, want)


def test_aperture_mask_in_trace():
    """A rectangular mask on the stop surface clips the expected rays."""
    from optiland_tpu.system.optic import Optic
    from optiland_tpu.trace.tracer import trace_system

    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material=1.5,
                     is_stop=True,
                     aperture=RectangularAperture(-10.0, 10.0, -2.0, 2.0))
    lens.add_surface(index=2, radius=-50.0, thickness=45.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 10.0)
    lens.set_field_type("angle")
    lens.add_field(0.0, 0.0)
    lens.add_wavelength(0.55, is_primary=True)
    static, params = lens.build()
    n = 16
    hist = trace_system(static, params, jnp.zeros(n), jnp.zeros(n),
                        jnp.zeros(n), jnp.linspace(-0.99, 0.99, n),
                        jnp.full(n, 0.55))
    i = np.asarray(hist.intensity[-1])
    y1 = np.asarray(hist.y[1])
    assert np.all(i[np.abs(y1) > 2.0] == 0)
    assert np.all(i[np.abs(y1) < 1.9] > 0)


@pytest.mark.parametrize("model", ["ciddor", "edlen", "birch_downs",
                                   "kohlrausch"])
def test_air_index_parity(reference, model):
    from optiland.environment import (
        EnvironmentalConditions as RefCond,
        refractive_index_air as ref_air,
    )

    from optiland_tpu.environment import (
        EnvironmentalConditions,
        refractive_index_air,
    )

    for (t, p, rh, co2) in [(15.0, 101325.0, 0.0, 400.0),
                            (25.0, 90000.0, 0.55, 450.0),
                            (-10.0, 105000.0, 0.2, 380.0)]:
        ref_c = RefCond(pressure=p, temperature=t, relative_humidity=rh,
                        co2_ppm=co2)
        my_c = EnvironmentalConditions(pressure=p, temperature=t,
                                       relative_humidity=rh, co2_ppm=co2)
        for wl in (0.4, 0.55, 0.6328, 1.0):
            want = float(ref_air(wl, ref_c, model=model))
            got = float(refractive_index_air(wl, my_c, model=model))
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_schott_thermal_correction_parity(reference):
    """Thermal dn/dT correction vs the reference MaterialFile path on N-BK7."""
    from optiland.materials import Material

    mat = Material("N-BK7")
    if getattr(mat, "thermdispcoef", None) is None or mat._t0 is None:
        pytest.skip("reference N-BK7 file lacks thermal data")

    from optiland_tpu.environment import (
        relative_wavelength,
        schott_thermal_correction,
    )

    wl = 0.55
    n_ref_t = float(mat.n(wl, temperature=40.0, pressure=1.0))
    waverel = float(relative_wavelength(wl, 40.0, 1.0, float(mat._t0)))
    base = float(mat.n(waverel))
    got = float(schott_thermal_correction(
        base, wl, tuple(float(c) for c in mat.thermdispcoef),
        float(mat._t0), 40.0, 1.0))
    np.testing.assert_allclose(got, n_ref_t, rtol=0, atol=1e-10)
