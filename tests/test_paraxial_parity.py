"""Paraxial-engine parity vs. the mounted reference on sample lenses
(BASELINE config 1 et al.)."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet, DoubleGauss, ReverseTelephoto

MODELS = {
    "CookeTriplet": CookeTriplet,
    "DoubleGauss": DoubleGauss,
    "ReverseTelephoto": ReverseTelephoto,
}


@pytest.fixture(scope="module")
def ref_lenses(reference):
    from optiland.samples import objectives

    return {name: getattr(objectives, name)() for name in MODELS}


@pytest.fixture(scope="module")
def tpu_lenses():
    return {name: cls() for name, cls in MODELS.items()}


@pytest.mark.parametrize("name", list(MODELS))
@pytest.mark.parametrize(
    "prop", ["f1", "f2", "F1", "F2", "EPL", "EPD", "XPL", "XPD", "FNO",
             "magnification", "invariant"]
)
def test_paraxial_property_parity(name, prop, ref_lenses, tpu_lenses):
    ref = float(np.asarray(getattr(ref_lenses[name].paraxial, prop)()))
    got = float(np.asarray(getattr(tpu_lenses[name].paraxial, prop)()))
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("name", list(MODELS))
def test_marginal_chief_ray_parity(name, ref_lenses, tpu_lenses):
    ya_r, ua_r = ref_lenses[name].paraxial.marginal_ray()
    yb_r, ub_r = ref_lenses[name].paraxial.chief_ray()
    ya, ua = tpu_lenses[name].paraxial.marginal_ray()
    yb, ub = tpu_lenses[name].paraxial.chief_ray()
    np.testing.assert_allclose(np.ravel(ya), np.ravel(ya_r), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.ravel(ua), np.ravel(ua_r), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.ravel(yb), np.ravel(yb_r), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.ravel(ub), np.ravel(ub_r), rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("name", list(MODELS))
def test_index_table_parity(name, ref_lenses, tpu_lenses):
    from optiland_tpu.system import paraxial as px

    static, params = tpu_lenses[name].build()
    w = tpu_lenses[name].primary_wavelength
    n_ref = np.ravel(ref_lenses[name].surfaces.n(w))
    n_got = np.asarray(px.index_table(static, params, w))
    np.testing.assert_allclose(n_got, n_ref, rtol=1e-12)


@pytest.mark.parametrize("name", list(MODELS))
def test_positions_parity(name, ref_lenses, tpu_lenses):
    static, params = tpu_lenses[name].build()
    pos_ref = np.ravel(np.asarray(ref_lenses[name].surfaces.positions))
    pos_got = np.asarray(params.positions())
    np.testing.assert_allclose(pos_got[1:], pos_ref[1:], rtol=1e-12, atol=1e-12)
