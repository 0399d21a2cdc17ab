"""Tests for the second wave of analyses: through-focus, pupil aberration,
angle-vs-height, irradiance, Jones pupil, MTF-vs-field, colorimetry."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet


@pytest.fixture(scope="module")
def lens():
    return CookeTriplet()


def test_through_focus_spot(lens):
    from optiland_tpu.analysis import ThroughFocusSpotDiagram

    tf = ThroughFocusSpotDiagram(lens, delta_focus=0.2, num_steps=5,
                                 num_rings=4)
    rms = np.asarray(tf.rms_spot_radius())
    assert rms.shape == (5, 3, 3)
    assert np.all(np.isfinite(rms))
    # on-axis: nominal plane is near best focus, so the extremes are worse
    on_axis = rms[:, 0, 1]
    assert on_axis[0] > on_axis[2] and on_axis[4] > on_axis[2]


def test_through_focus_validates_steps(lens):
    from optiland_tpu.analysis import ThroughFocusSpotDiagram

    with pytest.raises(ValueError):
        ThroughFocusSpotDiagram(lens, num_steps=4)


def test_through_focus_mtf(lens):
    from optiland_tpu.analysis import ThroughFocusMTF

    tf = ThroughFocusMTF(lens, freq=20.0, num_steps=5, num_rays=24)
    assert tf.data.shape == (5, 3, 2)
    assert np.all(tf.data >= 0) and np.all(tf.data <= 1.0 + 1e-9)


def test_pupil_aberration_parity(lens, reference):
    from optiland.analysis import PupilAberration as RefPA

    from optiland_tpu.analysis import PupilAberration

    ref_lens_mod = __import__("optiland.samples.objectives",
                              fromlist=["CookeTriplet"])
    ref = RefPA(ref_lens_mod.CookeTriplet(), num_points=17)
    got = PupilAberration(lens, num_points=17)
    for field in got.fields:
        for w in got.wavelengths:
            ref_ey = np.asarray(ref.data[f"{field}"][f"{w}"]["y"])
            got_ey = got.data[field][w]["y"]
            mask = np.isfinite(ref_ey) & np.isfinite(got_ey)
            assert mask.sum() > 10
            np.testing.assert_allclose(got_ey[mask], ref_ey[mask],
                                       rtol=1e-6, atol=1e-9)


def test_angle_vs_height(lens):
    from optiland_tpu.analysis import AngleVsHeight

    avh = AngleVsHeight(lens, num_points=16)
    assert np.all(np.isfinite(avh.data["height"]))
    assert np.all(np.abs(avh.data["angle"]) < 90)


def test_irradiance_conserves_power(lens):
    from optiland_tpu.analysis import IncoherentIrradiance

    irr = IncoherentIrradiance(lens, fields=[(0, 0)], wavelengths=[0.55],
                               num_rays=2000, res=(32, 32))
    g = np.asarray(irr.data[0][0])
    assert g.shape == (32, 32)
    (xmin, xmax), (ymin, ymax) = irr.extent
    px_area = (xmax - xmin) / 32 * (ymax - ymin) / 32
    total_power = g.sum() * px_area
    assert total_power > 1000  # most of the 2000 rays land inside
    assert float(irr.peak_irradiance()[0][0]) > 0


def test_jones_pupil(lens):
    from optiland_tpu.analysis import JonesPupil

    jp = JonesPupil(lens, field=(0, 0), wavelengths=[0.55], grid_size=8)
    J = np.asarray(jp.data[0]["J"])
    assert J.shape == (64, 2, 2)
    # uncoated lens: near-identity Jones (diagonal ~1, off-diagonal ~0)
    assert np.abs(np.abs(J[:, 0, 0]) - 1).max() < 0.05
    assert np.abs(J[:, 0, 1]).max() < 0.05


def test_mtf_vs_field(lens):
    from optiland_tpu.analysis import MTFvsField

    mvf = MTFvsField(lens, freqs=(10.0,), num_fields=5, num_rays=16)
    assert mvf.data["tangential"].shape == (5, 1)
    assert np.all(mvf.data["tangential"] <= 1.0 + 1e-9)


def test_colorimetry_parity(reference):
    from optiland.colorimetry.core import (
        spectrum_to_xyz as ref_s2x,
        xyz_to_srgb as ref_srgb,
    )

    from optiland_tpu.colorimetry import spectrum_to_xyz, xyz_to_srgb

    wl = np.linspace(360, 800, 100)
    vals = 0.5 + 0.4 * np.sin(wl / 60.0)
    X, Y, Z = spectrum_to_xyz(wl, vals)
    Xr, Yr, Zr = ref_s2x(list(wl), list(vals))
    # interpolation kind differs (linear vs cubic) -> small tolerance
    np.testing.assert_allclose([float(X), float(Y), float(Z)],
                               [float(Xr), float(Yr), float(Zr)], rtol=2e-3)
    # the reference returns 0-255 channel values without peak normalization
    rgb = [float(v) * 255 for v in xyz_to_srgb(X, Y, Z, normalize=False)]
    rgb_ref = [float(v) for v in ref_srgb(Xr, Yr, Zr)]
    np.testing.assert_allclose(rgb, rgb_ref, atol=2.0)


def test_colorimetry_rejects_partial_spectrum():
    from optiland_tpu.colorimetry import spectrum_to_xyz

    with pytest.raises(ValueError):
        spectrum_to_xyz([400, 500, 600], [1, 1, 1])


def test_radiant_intensity_parity(reference):
    """Angle-space power binning matches the reference's RadiantIntensity
    on the same traced rays (`analysis/intensity.py:152-280`)."""
    import numpy as np

    from optiland.analysis.intensity import RadiantIntensity as RefRI
    from optiland.samples.objectives import CookeTriplet as RefCooke

    from optiland_tpu.analysis import RadiantIntensity
    from optiland_tpu.models import CookeTriplet

    kw = dict(fields=[(0.0, 0.0)], wavelengths=[0.55],
              num_rays=6, distribution="hexapolar")
    ref = RefRI(RefCooke(), num_angular_bins_X=16, num_angular_bins_Y=16,
                angle_X_min=-10, angle_X_max=10, angle_Y_min=-10,
                angle_Y_max=10, **kw)
    ref_map = np.asarray(ref.data[0][0][0])

    # bin the REFERENCE's traced rays with OUR binner: isolates binning
    # parity from 1e-13 trace differences that flip edge-sitting rays
    from optiland_tpu.analysis.intensity import bin_radiant_intensity

    surf = ref.optic.surface_group.surfaces[-1]
    got_map, *_ = bin_radiant_intensity(
        np.asarray(surf.L), np.asarray(surf.M), np.asarray(surf.N),
        np.asarray(surf.intensity), (-10, 10), (-10, 10), (16, 16))
    # the reference histograms with bins=[x, y] -> map indexed [x_bin, y_bin];
    # ours is image-style [y_bin, x_bin]
    np.testing.assert_allclose(np.asarray(got_map), ref_map.T,
                               rtol=1e-8, atol=1e-8)

    # and the end-to-end path on our own trace produces the same total power
    got = RadiantIntensity(CookeTriplet(), num_angular_bins=(16, 16),
                           angle_x_range=(-10, 10), angle_y_range=(-10, 10),
                           use_absolute_units=False, **kw)
    ref_rel = RefRI(RefCooke(), num_angular_bins_X=16, num_angular_bins_Y=16,
                    angle_X_min=-10, angle_X_max=10, angle_Y_min=-10,
                    angle_Y_max=10, use_absolute_units=False, **kw)
    np.testing.assert_allclose(float(np.asarray(got.data[0][0][0]).sum()),
                               float(np.asarray(ref_rel.data[0][0][0]).sum()),
                               rtol=1e-9)
