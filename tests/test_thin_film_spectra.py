"""Thin-film R/T spectra golden tables (VERDICT r4 item 3) — analytic
closed forms every coating textbook publishes, plus dense-grid parity vs the
mounted reference TMM (`optiland/thin_film/core.py:81`).

Analytic tiers:
  - bare interface: Fresnel normal-incidence R = ((n1-n2)/(n1+n2))^2
  - Brewster angle: R_p == 0 at theta_B = atan(n2/n1)
  - quarter-wave AR layer: R = ((n0 ns - n1^2)/(n0 ns + n1^2))^2 at design λ
  - half-wave "absentee" layer: R equals the bare-interface value
  - QWOT high-reflector stack: R = ((1 - (nH/nL)^{2N} nH^2/ns)/(1 + ...))^2
  - energy conservation R + T + A == 1, with A == 0 for lossless stacks
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from optiland_tpu.thin_film import ThinFilmStack


def _R(stack, w, aoi=0.0, pol="s"):
    return float(np.asarray(stack.reflectance(w, aoi, pol)))


def test_bare_interface_fresnel_normal():
    st = ThinFilmStack(incident_material=1.0, substrate_material=1.52)
    want = ((1.0 - 1.52) / (1.0 + 1.52)) ** 2
    np.testing.assert_allclose(_R(st, 0.55), want, rtol=1e-12)


@pytest.mark.parametrize("n2", [1.33, 1.52, 1.75, 2.4])
def test_brewster_angle_rp_zero(n2):
    st = ThinFilmStack(incident_material=1.0, substrate_material=n2)
    theta_b = math.atan(n2)
    assert _R(st, 0.55, theta_b, "p") < 1e-12
    # s-polarization does NOT vanish there
    assert _R(st, 0.55, theta_b, "s") > 0.01


@pytest.mark.parametrize("aoi_deg", [0.0, 20.0, 45.0, 70.0])
def test_bare_interface_fresnel_oblique(aoi_deg):
    n0, ns = 1.0, 1.52
    st = ThinFilmStack(incident_material=n0, substrate_material=ns)
    th0 = math.radians(aoi_deg)
    th1 = math.asin(n0 * math.sin(th0) / ns)
    rs = (n0 * math.cos(th0) - ns * math.cos(th1)) / (
        n0 * math.cos(th0) + ns * math.cos(th1))
    rp = (ns * math.cos(th0) - n0 * math.cos(th1)) / (
        ns * math.cos(th0) + n0 * math.cos(th1))
    np.testing.assert_allclose(_R(st, 0.55, th0, "s"), rs * rs, rtol=1e-10)
    np.testing.assert_allclose(_R(st, 0.55, th0, "p"), rp * rp, rtol=1e-10)


def test_quarter_wave_ar_coating():
    # single λ/4 layer: R_min = ((n0 ns - n1^2) / (n0 ns + n1^2))^2
    n0, n1, ns, w0 = 1.0, 1.38, 1.52, 0.55
    st = ThinFilmStack(incident_material=n0, substrate_material=ns)
    st.add_layer(n1, w0 / (4 * n1))
    want = ((n0 * ns - n1 * n1) / (n0 * ns + n1 * n1)) ** 2
    np.testing.assert_allclose(_R(st, w0), want, rtol=1e-10)
    # ideal index sqrt(n0 ns) would null it; 1.38 on 1.52 leaves ~1.26%
    assert 0.01 < _R(st, w0) < 0.02


def test_half_wave_absentee_layer():
    # a λ/2 layer is optically absent at the design wavelength
    n0, n1, ns, w0 = 1.0, 2.3, 1.52, 0.55
    bare = ((n0 - ns) / (n0 + ns)) ** 2
    st = ThinFilmStack(incident_material=n0, substrate_material=ns)
    st.add_layer(n1, w0 / (2 * n1))
    np.testing.assert_allclose(_R(st, w0), bare, rtol=1e-9)


@pytest.mark.parametrize("pairs", [2, 4, 8])
def test_qwot_mirror_closed_form(pairs):
    # (HL)^N quarter-wave stack at design λ (H on the incident side, L on
    # the substrate): each pair multiplies the admittance by (nH/nL)^2,
    # so Y = (nH/nL)^{2N} ns and R = ((n0 - Y)/(n0 + Y))^2
    n0, nH, nL, ns, w0 = 1.0, 2.35, 1.46, 1.52, 0.55
    st = ThinFilmStack(incident_material=n0, substrate_material=ns)
    for _ in range(pairs):
        st.add_layer(nH, w0 / (4 * nH))
        st.add_layer(nL, w0 / (4 * nL))
    Y = (nH / nL) ** (2 * pairs) * ns
    want = ((n0 - Y) / (n0 + Y)) ** 2
    np.testing.assert_allclose(_R(st, w0), want, rtol=1e-9)


def test_qwot_mirror_reflectance_grows_with_pairs():
    vals = []
    n0, nH, nL, ns, w0 = 1.0, 2.35, 1.46, 1.52, 0.55
    for pairs in (1, 2, 4, 6):
        st = ThinFilmStack(incident_material=n0, substrate_material=ns)
        for _ in range(pairs):
            st.add_layer(nH, w0 / (4 * nH))
            st.add_layer(nL, w0 / (4 * nL))
        vals.append(_R(st, w0))
    assert all(b > a for a, b in zip(vals, vals[1:]))
    assert vals[-1] > 0.99


@pytest.mark.parametrize("pol", ["s", "p"])
@pytest.mark.parametrize("aoi_deg", [0.0, 30.0, 60.0])
def test_energy_conservation_lossless(pol, aoi_deg):
    st = ThinFilmStack(incident_material=1.0, substrate_material=1.52)
    st.add_layer(1.38, 0.1).add_layer(2.3, 0.05).add_layer(1.7, 0.08)
    w = np.linspace(0.4, 0.8, 41)
    _, _, R, T, A = st.compute_rtRTA(jnp.asarray(w),
                                     math.radians(aoi_deg), pol)
    R, T, A = np.asarray(R), np.asarray(T), np.asarray(A)
    np.testing.assert_allclose(R + T + A, 1.0, rtol=1e-10)
    np.testing.assert_allclose(A, 0.0, atol=1e-10)
    assert np.all((R >= 0) & (R <= 1)) and np.all((T >= 0) & (T <= 1))


def test_absorbing_layer_has_positive_absorptance():
    st = ThinFilmStack(incident_material=1.0, substrate_material=1.52)
    # metal-like layer: n + ik via an ideal material with extinction
    from optiland_tpu.materials.catalog import MaterialSpec

    metal = MaterialSpec(name="metal", formula=0, coefficients=(0.9,),
                         k_table=((0.4, 0.8), (2.5, 2.5)))
    st.add_layer(metal, 0.02)
    _, _, R, T, A = st.compute_rtRTA(0.55, 0.0, "s")
    R, T, A = float(np.asarray(R)), float(np.asarray(T)), float(np.asarray(A))
    np.testing.assert_allclose(R + T + A, 1.0, rtol=1e-9)
    assert A > 0.1


# ---------------------------------------------------------------------------
# parity vs the mounted reference's TMM on dense grids
# ---------------------------------------------------------------------------
def _ref_stack(reference, layers, n0=1.0, ns=1.52):
    from optiland.materials import IdealMaterial
    from optiland.thin_film import ThinFilmStack as RefStack

    st = RefStack(incident_material=IdealMaterial(n=n0),
                  substrate_material=IdealMaterial(n=ns))
    for n, d in layers:
        st.add_layer(IdealMaterial(n=n), d)
    return st


@pytest.mark.parametrize("pol", ["s", "p"])
@pytest.mark.parametrize("aoi_deg", [0.0, 25.0, 55.0])
def test_spectrum_parity_vs_reference(pol, aoi_deg, reference):
    layers = [(1.38, 0.0996), (2.35, 0.0585), (1.46, 0.0942),
              (2.35, 0.0585), (1.7, 0.0809)]
    ref = _ref_stack(reference, layers)
    mine = ThinFilmStack(incident_material=1.0, substrate_material=1.52)
    for n, d in layers:
        mine.add_layer(n, d)
    w = np.linspace(0.38, 0.85, 95)
    aoi = math.radians(aoi_deg)
    _, _, R, T, A = mine.compute_rtRTA(jnp.asarray(w), aoi, pol)
    res = ref.compute_rtRTA(w, aoi, polarization=pol)
    np.testing.assert_allclose(np.asarray(R), np.asarray(res["R"])[:, 0],
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(T), np.asarray(res["T"])[:, 0],
                               rtol=1e-8, atol=1e-10)


def test_amplitude_coefficient_parity_vs_reference(reference):
    layers = [(2.1, 0.07), (1.46, 0.09)]
    ref = _ref_stack(reference, layers)
    mine = ThinFilmStack(incident_material=1.0, substrate_material=1.52)
    for n, d in layers:
        mine.add_layer(n, d)
    w = np.linspace(0.45, 0.65, 21)
    r, tt, _, _, _ = mine.compute_rtRTA(jnp.asarray(w), 0.3, "p")
    res = ref.compute_rtRTA(w, 0.3, polarization="p")
    np.testing.assert_allclose(np.asarray(r), np.asarray(res["r"])[:, 0],
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(tt), np.asarray(res["t"])[:, 0],
                               rtol=1e-8, atol=1e-10)
