"""File I/O: Zemax import parity vs the reference loader, optiland JSON
round trips (ours and cross-framework), solves/pickups."""

import math

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.fileio import (
    load_optiland_file,
    load_zemax_file,
    optic_from_dict,
    save_optiland_file,
)

ZMX_DIR = "/root/reference/tests/zemax_files"


@pytest.mark.parametrize("fname", ["lens1.zmx", "lens2.zmx"])
def test_zemax_import_matches_reference(fname, reference):
    from optiland.fileio import load_zemax_file as ref_load

    ref = ref_load(f"{ZMX_DIR}/{fname}")
    got = load_zemax_file(f"{ZMX_DIR}/{fname}")

    # prescription parity
    assert len(got.surfaces) == ref.surfaces.num_surfaces
    ref_radii = np.asarray(ref.surfaces.radii, float)
    got_radii = np.asarray([s.radius for s in got.surfaces.specs])
    np.testing.assert_allclose(
        np.where(np.isinf(got_radii), 0, got_radii),
        np.where(np.isinf(ref_radii), 0, ref_radii), rtol=1e-9,
    )

    # first-order parity
    np.testing.assert_allclose(float(got.paraxial.f2()),
                               float(np.asarray(ref.paraxial.f2())),
                               rtol=1e-6)
    np.testing.assert_allclose(float(got.paraxial.EPD()),
                               float(np.asarray(ref.paraxial.EPD())),
                               rtol=1e-9)

    # real-trace parity on axis
    ref.trace(Hx=0, Hy=0, wavelength=got.primary_wavelength, num_rays=4,
              distribution="hexapolar")
    ref_y = np.asarray(ref.surfaces.y[-1])
    hist = got.trace(Hx=0, Hy=0, num_rays=4)
    np.testing.assert_allclose(np.asarray(hist.y[-1]), ref_y, atol=1e-9)


@pytest.mark.parametrize("fname", ["one_mirror_up_45deg.zmx",
                                   "simple_fold_mirror_up.zmx"])
def test_zemax_import_fold_mirror_trace_parity(fname, reference):
    """Folded (coordinate-break) systems: full global-frame ray parity."""
    from optiland.fileio import load_zemax_file as ref_load

    ref = ref_load(f"{ZMX_DIR}/{fname}")
    got = load_zemax_file(f"{ZMX_DIR}/{fname}")
    assert len(got.surfaces) == ref.surfaces.num_surfaces

    w = float(np.asarray(ref.wavelengths.primary_wavelength.value))
    ref.trace(Hx=0, Hy=0, wavelength=w, num_rays=3, distribution="hexapolar")
    hist = got.trace(Hx=0, Hy=0, num_rays=3)
    for rv, gv in [(ref.surfaces.x[-1], hist.x[-1]),
                   (ref.surfaces.y[-1], hist.y[-1]),
                   (ref.surfaces.z[-1], hist.z[-1])]:
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-9)


def test_optiland_json_roundtrip(tmp_path):
    from optiland_tpu.models import CookeTriplet

    lens = CookeTriplet()
    path = tmp_path / "cooke.json"
    save_optiland_file(lens, str(path))
    lens2 = load_optiland_file(str(path))
    np.testing.assert_allclose(float(lens2.paraxial.f2()),
                               float(lens.paraxial.f2()), rtol=1e-12)
    h1 = lens.trace(Hx=0, Hy=1, num_rays=4)
    h2 = lens2.trace(Hx=0, Hy=1, num_rays=4)
    np.testing.assert_allclose(np.asarray(h2.y[-1]), np.asarray(h1.y[-1]),
                               rtol=1e-12)


def test_load_reference_exported_json(reference, tmp_path):
    """Cross-framework: load a JSON written by the REFERENCE."""
    from optiland.fileio import save_optiland_file as ref_save
    from optiland.samples.objectives import CookeTriplet as RefCooke

    ref = RefCooke()
    path = tmp_path / "ref_cooke.json"
    ref_save(ref, str(path))
    got = optic_from_dict(__import__("json").load(open(path)))
    np.testing.assert_allclose(float(got.paraxial.f2()),
                               float(np.asarray(ref.paraxial.f2())),
                               rtol=1e-8)


def test_quick_focus_solve():
    from optiland_tpu.models import CookeTriplet

    lens = CookeTriplet()
    # defocus the image plane, then quick_focus should restore small spots
    lens.surfaces.specs[-2].thickness += 3.0
    lens._dirty()
    from optiland_tpu.analysis import SpotDiagram

    rms_bad = float(np.asarray(SpotDiagram(lens).rms_spot_radius())[0, 1])
    lens.solves.add("quick_focus")
    rms_good = float(np.asarray(SpotDiagram(lens).rms_spot_radius())[0, 1])
    assert rms_good < rms_bad / 5


def test_marginal_ray_height_solve():
    from optiland_tpu.models import CookeTriplet

    lens = CookeTriplet()
    lens.solves.add("marginal_ray_height", 7, 0.0)  # image at paraxial focus
    y, _ = lens.paraxial.marginal_ray()
    np.testing.assert_allclose(float(np.asarray(y).ravel()[-1]), 0.0,
                               atol=1e-9)


def test_pickup_links_radius():
    from optiland_tpu.models import CookeTriplet

    lens = CookeTriplet()
    lens.pickups.add(1, "radius", 5, scale=2.0)
    assert lens.surfaces.specs[5].radius == pytest.approx(
        2.0 * lens.surfaces.specs[1].radius
    )
    # re-applies on update()
    lens.surfaces.specs[1].radius = 25.0
    lens.update()
    assert lens.surfaces.specs[5].radius == pytest.approx(50.0)


def test_zemax_grating_file_loads():
    got = load_zemax_file(f"{ZMX_DIR}/flat_transmission_grating.zmx")
    h = got.trace(num_rays=3)
    assert np.all(np.isfinite(np.asarray(h.y[-1])))


_ = math


@pytest.mark.parametrize("fname", ["cooke_triplet.seq", "asphere.seq",
                                   "mirror.seq", "fno_fields.seq",
                                   "telescope_objective.seq"])
def test_codev_import_matches_reference(fname, reference):
    from optiland.fileio import load_codev_file as ref_load

    from optiland_tpu.fileio import load_codev_file

    path = f"/root/reference/tests/test_fileio/codev_files/{fname}"
    ref = ref_load(path)
    got = load_codev_file(path)
    assert len(got.surfaces) == ref.surfaces.num_surfaces
    np.testing.assert_allclose(float(got.paraxial.f2()),
                               float(np.asarray(ref.paraxial.f2())),
                               rtol=5e-4)


# ---------------------------------------------------------------------------
# Writers (reference `fileio/zemax/writer/`, `fileio/codev/writer/`) and
# all-fixture import parity
# ---------------------------------------------------------------------------
_ALL_ZMX = [
    "circular_aperture_example_with_aperture.zmx",
    "circular_aperture_example_without_aperture.zmx",
    "complicated_fold_mirrors_setup_v2.zmx",
    "lens1.zmx",
    "lens2.zmx",
    "lens_floa.zmx",
    "lens_thorlabs_iso_8859_1.zmx",
    "one_mirror_up_45deg.zmx",
    "simple_fold_mirror_up.zmx",
    "thorlabs_lj1598l1.zmx",
]
# the 3 grating fixtures use TYPE DGRATING, which the reference loader
# itself rejects ("Unsupported Zemax surface type: dgrating") — excluded.


@pytest.mark.parametrize("fname", _ALL_ZMX)
def test_zemax_import_trace_parity_all_fixtures(fname, reference):
    """On-axis trace parity vs the reference loader for every loadable
    fixture (incl. fold mirrors and the toroidal cylinder lens)."""
    from optiland.fileio import load_zemax_file as ref_load

    ref = ref_load(f"{ZMX_DIR}/{fname}")
    got = load_zemax_file(f"{ZMX_DIR}/{fname}")
    wl = float(np.asarray(ref.primary_wavelength))
    rr = ref.trace(Hx=0.0, Hy=0.0, wavelength=wl, num_rays=4,
                   distribution="hexapolar")
    h = got.trace(Hx=0.0, Hy=0.0, wavelength=wl, num_rays=4)
    # compare on rays the reference keeps (TIR/miss rays go NaN there but
    # stay finite-with-zero-intensity here; clip semantics cover the rest)
    ry, rx_, ri = (np.asarray(v) for v in (rr.y, rr.x, rr.i))
    valid = np.isfinite(ry) & (ri > 0)
    assert valid.sum() > len(ry) // 2
    np.testing.assert_allclose(np.asarray(h.y[-1])[valid], ry[valid],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(h.x[-1])[valid], rx_[valid],
                               atol=1e-9)


_RT_ZMX = [f for f in _ALL_ZMX
           if f not in ("complicated_fold_mirrors_setup_v2.zmx",
                        "one_mirror_up_45deg.zmx",
                        "simple_fold_mirror_up.zmx")]


@pytest.mark.parametrize("fname", _RT_ZMX)
def test_zemax_write_read_round_trip(fname, tmp_path):
    """read -> write -> read reproduces the traced behavior (on-axis
    fixtures; fold-mirror COORDBRK emission is not yet supported)."""
    from optiland_tpu.fileio import save_zemax_file

    got = load_zemax_file(f"{ZMX_DIR}/{fname}")
    out = tmp_path / "rt.zmx"
    save_zemax_file(got, str(out))
    back = load_zemax_file(str(out))

    assert len(back.surfaces) == len(got.surfaces)
    wl = got.primary_wavelength
    h1 = got.trace(Hx=0.0, Hy=0.0, wavelength=wl, num_rays=4)
    h2 = back.trace(Hx=0.0, Hy=0.0, wavelength=wl, num_rays=4)
    # the .zmx format carries 9 significant digits (%.8E), so traced spots
    # agree to ~1e-6 mm, not machine precision
    np.testing.assert_allclose(np.asarray(h2.y[-1]), np.asarray(h1.y[-1]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(back.paraxial.f2()),
                               float(got.paraxial.f2()), rtol=1e-7)


def test_zemax_writer_asphere_round_trip(tmp_path):
    """A from-scratch even-asphere system round-trips through .zmx."""
    from optiland_tpu.fileio import save_zemax_file
    from optiland_tpu.system.optic import Optic

    lens = Optic("Asph")
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                     is_stop=True, surface_type="even_asphere",
                     coefficients=(1e-6, -2e-9), conic=-0.5)
    lens.add_surface(index=2, radius=-80.0, thickness=42.0)
    lens.add_surface(index=3)
    lens.set_aperture("imageFNO", 4.0)
    lens.set_field_type("angle")
    lens.add_field(y=0.0)
    lens.add_field(y=5.0)
    lens.add_wavelength(0.486)
    lens.add_wavelength(0.587, is_primary=True)
    lens.add_wavelength(0.656)

    out = tmp_path / "asph.zmx"
    save_zemax_file(lens, str(out))
    back = load_zemax_file(str(out))
    s1 = back.surfaces.specs[1]
    assert s1.geometry == "even_asphere"
    np.testing.assert_allclose(s1.coefficients, (1e-6, -2e-9))
    np.testing.assert_allclose(s1.conic, -0.5)
    assert back.aperture_type == "imageFNO"
    assert back.wavelengths.primary_idx == 1
    np.testing.assert_allclose(float(back.paraxial.f2()),
                               float(lens.paraxial.f2()), rtol=1e-9)


def test_codev_write_read_round_trip(tmp_path):
    """CODE V writer round-trips a tilted/decentered asphere system."""
    from optiland_tpu.fileio import load_codev_file, save_codev_file
    from optiland_tpu.system.optic import Optic

    lens = Optic("CV")
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=60.0, thickness=6.0, material="N-BK7",
                     is_stop=True, surface_type="even_asphere",
                     coefficients=(2e-6, -1e-9), conic=-0.2,
                     dx=0.1, rx=0.01, aperture=12.0)
    lens.add_surface(index=2, radius=-90.0, thickness=40.0)
    lens.add_surface(index=3)
    lens.set_aperture("EPD", 12.0)
    lens.set_field_type("angle")
    lens.add_field(y=0.0)
    lens.add_field(y=3.0)
    lens.add_wavelength(0.55, is_primary=True)

    out = tmp_path / "rt.seq"
    save_codev_file(lens, str(out))
    back = load_codev_file(str(out))
    s1 = back.surfaces.specs[1]
    np.testing.assert_allclose(s1.radius, 60.0)
    np.testing.assert_allclose(s1.conic, -0.2)
    np.testing.assert_allclose(s1.coefficients, (2e-6, -1e-9))
    np.testing.assert_allclose(s1.dx, 0.1)
    np.testing.assert_allclose(s1.rx, 0.01, rtol=1e-7)
    np.testing.assert_allclose(float(s1.semi_aperture), 12.0)
    assert back.aperture_type == "EPD"
    h1 = lens.trace(Hx=0.0, Hy=1.0, num_rays=4)
    h2 = back.trace(Hx=0.0, Hy=1.0, num_rays=4)
    np.testing.assert_allclose(np.asarray(h2.y[-1]), np.asarray(h1.y[-1]),
                               rtol=1e-6, atol=1e-9)


def test_codev_fixture_round_trip(tmp_path, reference):
    """CODE V fixtures: read -> write -> read preserves the trace."""
    import glob as _glob

    from optiland_tpu.fileio import load_codev_file, save_codev_file

    files = sorted(_glob.glob("/root/reference/tests/test_fileio/codev_files/*.seq"))
    assert files, "no CODE V fixtures found"
    for f in files:
        got = load_codev_file(f)
        out = tmp_path / "rt.seq"
        save_codev_file(got, str(out))
        back = load_codev_file(str(out))
        h1 = got.trace(Hx=0.0, Hy=0.0, num_rays=4)
        h2 = back.trace(Hx=0.0, Hy=0.0, num_rays=4)
        np.testing.assert_allclose(np.asarray(h2.y[-1]),
                                   np.asarray(h1.y[-1]),
                                   rtol=1e-6, atol=1e-9, err_msg=f)
