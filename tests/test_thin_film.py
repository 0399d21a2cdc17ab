"""Thin-film TMM parity vs the reference (`thin_film/core.py:_tmm_coh`)."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.thin_film import ThinFilmStack


@pytest.fixture()
def ref_stack(reference):
    from optiland.materials import IdealMaterial
    from optiland.thin_film import ThinFilmStack as RefStack

    stack = RefStack(incident_material=IdealMaterial(1.0),
                     substrate_material=IdealMaterial(1.52))
    stack.add_layer(IdealMaterial(2.35), 0.058)  # high index ~TiO2
    stack.add_layer(IdealMaterial(1.38), 0.100)  # low index ~MgF2
    return stack


@pytest.fixture()
def tpu_stack():
    stack = ThinFilmStack(incident_material=1.0, substrate_material=1.52)
    stack.add_layer(2.35, 0.058)
    stack.add_layer(1.38, 0.100)
    return stack


@pytest.mark.parametrize("pol", ["s", "p"])
@pytest.mark.parametrize("aoi_deg", [0.0, 30.0, 60.0])
def test_tmm_parity(pol, aoi_deg, ref_stack, tpu_stack):
    wl = np.linspace(0.4, 0.8, 41)
    aoi = np.deg2rad(aoi_deg)
    out = ref_stack.compute_rtRTA(wl, aoi, pol)  # dict of (41, 1) grids
    r_ref, t_ref = np.asarray(out["r"]).ravel(), np.asarray(out["t"]).ravel()
    R_ref, T_ref = np.asarray(out["R"]).ravel(), np.asarray(out["T"]).ravel()
    A_ref = np.asarray(out["A"]).ravel()
    r, t, R, T, A = tpu_stack.compute_rtRTA(wl, aoi, pol)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_ref),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref),
                               rtol=1e-7, atol=1e-10)


def test_qwot_antireflection():
    """Single QWOT MgF2 layer on BK7-like glass cuts normal-incidence
    reflectance well below the bare Fresnel value."""
    bare = ThinFilmStack(incident_material=1.0, substrate_material=1.52)
    coated = ThinFilmStack(incident_material=1.0, substrate_material=1.52)
    coated.add_layer_qwot(1.38, 0.55)
    R_bare = float(bare.reflectance(0.55))
    R_coated = float(coated.reflectance(0.55))
    np.testing.assert_allclose(R_bare, ((1.52 - 1) / (1.52 + 1)) ** 2,
                               rtol=1e-6)
    assert R_coated < 0.015  # ~1.3% for n=1.38 on n=1.52


def test_stack_editing_helpers():
    s = ThinFilmStack(1.0, 1.5)
    s.add_layer(2.0, 0.1).add_layer_nm(1.4, 50.0)
    assert len(s) == 2
    s.split_layer(0, 0.25)
    assert len(s) == 3
    np.testing.assert_allclose(s.layers[0].thickness_um, 0.025)
    np.testing.assert_allclose(s.layers[1].thickness_um, 0.075)
    s.remove_layer(0)
    assert len(s) == 2
    # differentiability of the spectrum w.r.t. thickness
    import jax
    import jax.numpy as jnp

    def R_of_t(t):
        st = ThinFilmStack(1.0, 1.52)
        st.add_layer(1.38, t)
        return st.reflectance(jnp.asarray(0.55))

    g = jax.grad(lambda t: R_of_t(t).sum())(0.1)
    assert np.isfinite(float(g)) and abs(float(g)) > 0
