"""Analysis-layer parity vs. the mounted reference on sample lenses
(BASELINE configs 1-2): spot diagram metrics, ray fans, distortion, field
curvature, wavefront OPD, Zernike fit, FFT PSF/MTF."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet


@pytest.fixture(scope="module")
def ref_cooke(reference):
    from optiland.samples.objectives import CookeTriplet as RefCooke

    return RefCooke()


@pytest.fixture(scope="module")
def tpu_cooke():
    return CookeTriplet()


def test_spot_rms_parity(ref_cooke, tpu_cooke):
    from optiland.analysis import SpotDiagram as RefSpot

    from optiland_tpu.analysis import SpotDiagram

    ref = RefSpot(ref_cooke, num_rings=6)
    got = SpotDiagram(tpu_cooke, num_rings=6)
    ref_rms = np.array([[float(v) for v in row] for row in ref.rms_spot_radius()])
    got_rms = np.asarray(got.rms_spot_radius())
    np.testing.assert_allclose(got_rms, ref_rms, rtol=1e-8, atol=1e-12)

    ref_geo = np.array(
        [[float(v) for v in row] for row in ref.geometric_spot_radius()]
    )
    got_geo = np.asarray(got.geometric_spot_radius())
    np.testing.assert_allclose(got_geo, ref_geo, rtol=1e-8, atol=1e-12)


def test_spot_centroid_parity(ref_cooke, tpu_cooke):
    from optiland.analysis import SpotDiagram as RefSpot

    from optiland_tpu.analysis import SpotDiagram

    ref = RefSpot(ref_cooke, num_rings=6)
    got = SpotDiagram(tpu_cooke, num_rings=6)
    ref_c = np.array([[float(a), float(b)] for a, b in ref.centroid()])
    got_c = np.array([[float(a), float(b)] for a, b in got.centroid()])
    np.testing.assert_allclose(got_c, ref_c, rtol=1e-8, atol=1e-12)


def test_ray_fan_parity(ref_cooke, tpu_cooke):
    from optiland.analysis import RayFan as RefFan

    from optiland_tpu.analysis import RayFan

    ref = RefFan(ref_cooke, num_points=33)
    got = RayFan(tpu_cooke, num_points=33)
    for fi, field in enumerate(got.fields):
        for wi, w in enumerate(got.wavelengths):
            ref_ey = np.asarray(ref.data[f"{field}"][f"{w}"]["y"])
            got_ey = np.asarray(got.data["ey"][fi, wi])
            np.testing.assert_allclose(got_ey, ref_ey, rtol=1e-7, atol=1e-10)


def test_distortion_parity(ref_cooke, tpu_cooke):
    from optiland.analysis import Distortion as RefDist

    from optiland_tpu.analysis import Distortion

    ref = RefDist(ref_cooke, num_points=16)
    got = Distortion(tpu_cooke, num_points=16)
    for k in range(len(got.wavelengths)):
        np.testing.assert_allclose(
            np.asarray(got.data[k]), np.asarray(ref.data[k]),
            rtol=1e-6, atol=1e-9,
        )


def test_field_curvature_parity(ref_cooke, tpu_cooke):
    from optiland.analysis import FieldCurvature as RefFC

    from optiland_tpu.analysis import FieldCurvature

    ref = RefFC(ref_cooke, num_points=16)
    got = FieldCurvature(tpu_cooke, num_points=16)
    for k in range(len(got.wavelengths)):
        np.testing.assert_allclose(
            np.asarray(got.data[k][0]), np.asarray(ref.data[k][0]),
            rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(got.data[k][1]), np.asarray(ref.data[k][1]),
            rtol=1e-6, atol=1e-9,
        )


def test_opd_parity(ref_cooke, tpu_cooke):
    from optiland.wavefront import OPD as RefOPD

    from optiland_tpu.wavefront import OPD

    ref = RefOPD(ref_cooke, (0.0, 1.0), 0.55, num_rays=6)
    got = OPD(tpu_cooke, (0.0, 1.0), 0.55, num_rings=6)
    ref_data = ref.get_data(ref.fields[0], ref.wavelengths[0])
    np.testing.assert_allclose(
        np.asarray(got.data.opd), np.asarray(ref_data.opd),
        rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        float(got.rms()), float(ref.rms()), rtol=1e-6
    )


def test_zernike_opd_parity(ref_cooke, tpu_cooke):
    from optiland.wavefront import ZernikeOPD as RefZOPD

    from optiland_tpu.wavefront import ZernikeOPD

    ref = RefZOPD(ref_cooke, (0.0, 1.0), 0.55, num_rings=10, num_terms=16)
    got = ZernikeOPD(tpu_cooke, (0.0, 1.0), 0.55, num_rings=10, num_terms=16)
    np.testing.assert_allclose(
        np.asarray(got.coeffs), np.asarray(ref.zernike.coeffs),
        rtol=1e-4, atol=1e-8,
    )


def test_zernike_indices_match_reference(reference):
    from optiland.zernike import ZernikeFringe, ZernikeNoll, ZernikeStandard

    from optiland_tpu import zernike as z

    for cls, name in [(ZernikeFringe, "fringe"), (ZernikeNoll, "noll"),
                      (ZernikeStandard, "standard")]:
        ref_idx = [(int(n), int(m)) for n, m in cls()._generate_indices(36)]
        got_idx = list(z.indices(name, 36))
        assert got_idx == ref_idx, f"{name} index mismatch"


def test_fft_psf_strehl_parity(ref_cooke, tpu_cooke):
    from optiland.psf import FFTPSF as RefPSF

    from optiland_tpu.psf import FFTPSF

    ref = RefPSF(ref_cooke, (0.0, 0.0), 0.55, num_rays=32, grid_size=64)
    got = FFTPSF(tpu_cooke, (0.0, 0.0), wavelength=[0.55], num_rays=32,
                 grid_size=64)
    np.testing.assert_allclose(
        float(got.strehl_ratio()), float(ref.strehl_ratio()), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.psf), np.asarray(ref.psf), rtol=1e-4, atol=1e-6
    )


def test_fft_mtf_parity(ref_cooke, tpu_cooke):
    from optiland.mtf import FFTMTF as RefMTF

    from optiland_tpu.mtf import FFTMTF

    ref = RefMTF(ref_cooke, wavelength=0.55, num_rays=32, grid_size=64)
    got = FFTMTF(tpu_cooke, wavelength=0.55, num_rays=32, grid_size=64)
    for i in range(len(got.fields)):
        ref_t, ref_s = ref.mtf[i]
        got_t, got_s = got.mtf[i]
        np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                                   rtol=1e-4, atol=1e-6)


def test_huygens_pallas_vs_xla():
    """Kernel parity: the Pallas Huygens kernel (interpreter mode on CPU)
    matches the pure-XLA fallback."""
    import jax.numpy as jnp

    from optiland_tpu.psf.huygens import huygens_sum_pallas, huygens_sum_xla

    rng = np.random.default_rng(0)
    n_img, n_pup = 64, 300
    IX = jnp.asarray(rng.uniform(-0.01, 0.01, (8, 8)))
    IY = jnp.asarray(rng.uniform(-0.01, 0.01, (8, 8)))
    IZ = jnp.full((8, 8), 50.0)
    ux = jnp.asarray(rng.uniform(-5, 5, n_pup))
    uy = jnp.asarray(rng.uniform(-5, 5, n_pup))
    uz = jnp.asarray(rng.uniform(-1, 1, n_pup))
    amp = jnp.asarray(rng.uniform(0, 1, n_pup))
    opd = jnp.asarray(rng.uniform(-1e-4, 1e-4, n_pup))
    wl = 0.55e-3
    Rp = 48.0

    ref = huygens_sum_xla((IX, IY, IZ), (ux, uy, uz), amp, opd, wl, Rp)
    got = huygens_sum_pallas((IX, IY, IZ), (ux, uy, uz), amp, opd, wl, Rp,
                             tile_i=64, tile_p=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=1e-3 * float(jnp.max(ref)))
