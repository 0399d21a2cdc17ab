"""Parity tests for the image-height field types, telecentric validation,
and the full material database (reference `fields/field_types/`,
`materials/material.py`)."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet


@pytest.mark.parametrize("ft", ["paraxial_image_height", "real_image_height"])
def test_image_height_field_trace_parity(reference, ft):
    from optiland.samples.objectives import CookeTriplet as RefCooke

    ref = RefCooke()
    ref.set_field_type(ft)
    got = CookeTriplet()
    got.set_field_type(ft)
    r = ref.trace(Hx=0.3, Hy=1.0, wavelength=0.55, num_rays=8,
                  distribution="hexapolar")
    h = got.trace(Hx=0.3, Hy=1.0, wavelength=0.55, num_rays=8,
                  distribution="hexapolar")
    np.testing.assert_allclose(np.asarray(h.x[-1]), np.asarray(r.x),
                               rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(h.y[-1]), np.asarray(r.y),
                               rtol=1e-9, atol=1e-10)


def test_image_height_chief_ray_parity(reference):
    from optiland.samples.objectives import CookeTriplet as RefCooke

    ref = RefCooke()
    ref.set_field_type("paraxial_image_height")
    got = CookeTriplet()
    got.set_field_type("paraxial_image_height")
    ry, ru = ref.paraxial.chief_ray()
    gy, gu = got.paraxial.chief_ray()
    np.testing.assert_allclose(np.asarray(gy).ravel(),
                               np.asarray(ry).ravel(), rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gu).ravel(),
                               np.asarray(ru).ravel(), rtol=1e-8, atol=1e-12)


def test_telecentric_validation():
    lens = CookeTriplet()
    lens.set_telecentric(True)
    with pytest.raises(ValueError, match="telecentric"):
        lens.build()  # angle fields + EPD: doubly incompatible
    lens.set_field_type("object_height")
    with pytest.raises(ValueError, match="not compatible"):
        lens.build()


def test_invalid_field_type_rejected():
    lens = CookeTriplet()
    with pytest.raises(ValueError, match="Invalid field type"):
        lens.set_field_type("bogus")


# ---------------------------------------------------------------------------
# Full material database


@pytest.mark.parametrize("name", [
    "N-BK7", "SF11", "N-SF6", "LAK9", "N-LAK34", "BAF10", "FK51A",
    "N-PK52A", "SK16", "LITHOTEC-CAF2",
])
def test_material_index_parity(reference, name):
    import contextlib
    import io

    from optiland.materials.material import Material

    from optiland_tpu.materials.catalog import resolve_material
    from optiland_tpu.materials.dispersion import material_index

    spec = resolve_material(name)
    with contextlib.redirect_stdout(io.StringIO()):
        ref = Material(name)
    for w in (0.45, 0.55, 0.6563):
        ours = float(np.asarray(material_index(
            spec.formula, spec.n_coeffs, np.array(spec.coefficients), w)))
        theirs = float(np.asarray(ref.n(w)).ravel()[0])
        assert abs(ours - theirs) < 2e-9, (name, w, ours, theirs)


def test_material_reference_disambiguation(reference):
    import contextlib
    import io

    from optiland.materials.material import Material

    from optiland_tpu.materials.catalog import find_material

    row = find_material("SF4", "hikari")
    with contextlib.redirect_stdout(io.StringIO()):
        ref = Material("SF4", reference="hikari")
    assert row["file"] == ref.material_data["filename"]


def test_tabulated_material(reference):
    import contextlib
    import io

    from optiland.materials.material import Material

    from optiland_tpu.materials.catalog import resolve_material
    from optiland_tpu.materials.dispersion import (
        FORMULA_TABULATED,
        material_index,
    )

    spec = resolve_material(("Ag", "Johnson"))
    assert spec.formula == FORMULA_TABULATED
    with contextlib.redirect_stdout(io.StringIO()):
        ref = Material("Ag", reference="Johnson")
    for w in (0.3, 0.5876, 1.2):
        ours = float(np.asarray(material_index(
            spec.formula, spec.n_coeffs, np.array(spec.coefficients), w)))
        theirs = float(np.asarray(ref.n(w)).ravel()[0])
        assert abs(ours - theirs) < 1e-12


def test_catalog_scale():
    from optiland_tpu.materials.catalog import _load_catalog, catalog_names

    rows = _load_catalog()
    assert len(rows) == 3201  # every row of the reference's catalog_nk.csv
    assert len(catalog_names()) > 1000


def test_unknown_material_raises():
    from optiland_tpu.materials.catalog import resolve_material

    with pytest.raises(KeyError, match="No matches"):
        resolve_material("definitely-not-a-glass-xyzzy")


def test_thermal_coefficients_extracted(reference):
    from optiland_tpu.materials.catalog import resolve_material

    spec = resolve_material("N-BK7")
    assert spec.therm is not None and len(spec.therm) == 6
    assert spec.t0 is not None


def test_trace_with_catalog_glass():
    """A full trace through catalog glasses exercises the packed widths."""
    import math

    from optiland_tpu.system.optic import Optic

    lens = Optic("Cat")
    lens.add_surface(index=0, radius=math.inf, thickness=math.inf)
    lens.add_surface(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                     is_stop=True)
    lens.add_surface(index=2, radius=-50.0, thickness=47.0)
    lens.add_surface(index=3)
    lens.set_aperture(aperture_type="EPD", value=10.0)
    lens.add_wavelength(value=0.5876, is_primary=True)
    h = lens.trace(Hx=0.0, Hy=0.0, wavelength=0.5876, num_rays=8)
    assert np.isfinite(np.asarray(h.y[-1])).all()
