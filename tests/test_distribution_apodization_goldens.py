"""Pupil distribution + apodization golden suite (VERDICT r4 item 3):
structural invariants of every sampling scheme (counts, radii, symmetry,
quadrature exactness) plus analytic apodization values and parity vs the
mounted reference (`optiland/distribution.py`, `optiland/apodization/`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from optiland_tpu.core import apodization as ap
from optiland_tpu.core import distributions as D


class TestDistributionGoldens:
    @pytest.mark.parametrize("rings", [1, 3, 6])
    def test_hexapolar_count_and_rings(self, rings):
        x, y = D.hexapolar(rings)
        x, y = np.asarray(x), np.asarray(y)
        assert x.size == 1 + 3 * rings * (rings + 1)
        r = np.hypot(x, y)
        # center point + ring radii exactly i/rings
        assert r[0] == 0.0
        np.testing.assert_allclose(sorted(set(np.round(r, 12))),
                                   np.linspace(0, 1, rings + 1), atol=1e-12)

    def test_uniform_grid_inside_disk(self):
        x, y = D.uniform(12)
        r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
        assert np.all(r2 <= 1.0 + 1e-12)
        # 4-fold symmetry of the masked grid
        pts = set(map(tuple, np.round(np.c_[x, y], 12)))
        assert all((-a, b) in pts and (a, -b) in pts for a, b in pts)

    def test_ring_exact_radius(self):
        x, y = D.ring(16, radius=0.73)
        np.testing.assert_allclose(np.hypot(np.asarray(x), np.asarray(y)),
                                   0.73, rtol=1e-12)
        # equally spaced angles
        th = np.sort(np.arctan2(np.asarray(y), np.asarray(x)))
        np.testing.assert_allclose(np.diff(th), 2 * np.pi / 16, rtol=1e-9)

    def test_line_and_cross(self):
        x, y = D.line_x(7)
        np.testing.assert_allclose(np.asarray(y), 0.0)
        np.testing.assert_allclose(np.asarray(x),
                                   np.linspace(-1, 1, 7), atol=1e-12)
        x, y = D.cross(9)
        pts = np.c_[np.asarray(x), np.asarray(y)]
        assert len(pts) == 17  # 2n - 1: shared origin deduplicated
        assert len({tuple(p) for p in np.round(pts, 12)}) == 17

    def test_random_is_area_uniform(self):
        x, y = D.random(20000, seed=0)
        r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
        # area-uniform: r^2 ~ U(0,1); mean 0.5, each annulus equally filled
        assert abs(r2.mean() - 0.5) < 0.01
        hist, _ = np.histogram(r2, bins=10, range=(0, 1))
        assert hist.min() > 0.8 * hist.mean()

    def test_sobol_deterministic_and_uniform(self):
        x1, y1 = D.sobol(512, seed=7)
        x2, y2 = D.sobol(512, seed=7)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        r2 = np.asarray(x1) ** 2 + np.asarray(y1) ** 2
        assert np.all(r2 <= 1.0) and abs(r2.mean() - 0.5) < 0.02

    def test_gaussian_quadrature_integrates_polynomials_exactly(self):
        """The Forbes GQ rings integrate radial polynomials in r^2 exactly
        up to degree 2*rings - 1: sum w_i f(r_i^2) == integral_0^1 f(u) du."""
        for rings in (2, 3, 5):
            Px, Py, w = D.gaussian_quadrature(rings, symmetric=True)
            r2 = np.asarray(Px) ** 2 + np.asarray(Py) ** 2
            w = np.asarray(w)
            for p in range(2 * rings):
                got = np.sum(w * r2 ** p)
                np.testing.assert_allclose(got, 1.0 / (p + 1), rtol=1e-12)

    def test_gaussian_quadrature_three_arms(self):
        Px, Py, w = D.gaussian_quadrature(3, symmetric=False)
        assert np.asarray(Px).size == 9  # 3 rings x 3 arms
        np.testing.assert_allclose(np.sum(np.asarray(w)), 1.0, rtol=1e-12)

    def test_generate_dispatch(self):
        x, y = D.generate("hexapolar", 3)
        assert np.asarray(x).size == 1 + 3 * 3 * 4
        with pytest.raises(ValueError, match="Unknown distribution"):
            D.generate("nope", 3)

    @pytest.mark.parametrize("name,num", [
        ("hexapolar", 4), ("uniform", 9), ("line_x", 11), ("line_y", 11),
        ("cross", 9), ("ring", 12),
    ])
    def test_parity_vs_reference(self, name, num, reference):
        from optiland.distribution import create_distribution

        ref = create_distribution(name)
        ref.generate_points(num)
        x, y = D.generate(name, num)
        ours = np.sort(np.round(np.c_[np.asarray(x), np.asarray(y)], 10),
                       axis=0)
        theirs = np.sort(np.round(np.c_[np.asarray(ref.x),
                                        np.asarray(ref.y)], 10), axis=0)
        np.testing.assert_allclose(ours, theirs, atol=1e-9)


class TestApodizationGoldens:
    def test_uniform_is_one(self):
        a = ap.UniformApodization()
        out = np.asarray(a.get_intensity(jnp.asarray([0.0, 0.5, 1.0]),
                                         jnp.asarray([0.0, 0.5, 0.0])))
        np.testing.assert_array_equal(out, 1.0)

    def test_gaussian_analytic(self):
        a = ap.GaussianApodization(sigma=0.5)
        val = float(np.asarray(a.get_intensity(jnp.asarray([0.5]),
                                               jnp.asarray([0.0]))))
        np.testing.assert_allclose(val, np.exp(-0.25 / (2 * 0.25)),
                                   rtol=1e-12)

    def test_cosine_squared_edges(self):
        a = ap.CosineSquaredApodization(R=1.0)
        c = float(np.asarray(a.get_intensity(jnp.asarray([0.0]),
                                             jnp.asarray([0.0]))))
        e = float(np.asarray(a.get_intensity(jnp.asarray([0.999999]),
                                             jnp.asarray([0.0]))))
        out = float(np.asarray(a.get_intensity(jnp.asarray([1.1]),
                                               jnp.asarray([0.0]))))
        assert c == pytest.approx(1.0)
        assert e == pytest.approx(0.0, abs=1e-10)
        assert out == 0.0

    def test_hann_window_shape(self):
        a = ap.HannApodization(D=2.0)
        # 0.5 (1 - cos(2 pi r / D)): zero on-axis, 0.5 at r = D/4,
        # rising toward the rim, zero outside
        v0 = float(np.asarray(a.get_intensity(jnp.asarray([0.0]),
                                              jnp.asarray([0.0]))))
        vq = float(np.asarray(a.get_intensity(jnp.asarray([0.5]),
                                              jnp.asarray([0.0]))))
        vo = float(np.asarray(a.get_intensity(jnp.asarray([1.5]),
                                              jnp.asarray([0.0]))))
        assert v0 == pytest.approx(0.0)
        assert vq == pytest.approx(0.5)
        assert vo == 0.0

    def test_tukey_flat_top_and_taper(self):
        a = ap.TukeyApodization(R=1.0, alpha=0.5)
        flat = float(np.asarray(a.get_intensity(jnp.asarray([0.3]),
                                                jnp.asarray([0.0]))))
        rim = float(np.asarray(a.get_intensity(jnp.asarray([0.9999]),
                                               jnp.asarray([0.0]))))
        assert flat == pytest.approx(1.0)
        assert rim == pytest.approx(0.0, abs=1e-6)

    def test_super_gaussian_order(self):
        a2 = ap.SuperGaussianApodization(w=1.0, n=2.0)
        a8 = ap.SuperGaussianApodization(w=1.0, n=8.0)
        # higher order -> flatter center, sharper edge
        v2 = float(np.asarray(a2.get_intensity(jnp.asarray([0.5]),
                                               jnp.asarray([0.0]))))
        v8 = float(np.asarray(a8.get_intensity(jnp.asarray([0.5]),
                                               jnp.asarray([0.0]))))
        assert v8 > v2

    def test_polynomial_analytic(self):
        a = ap.PolynomialApodization(R=1.0, p=2.0)
        val = float(np.asarray(a.get_intensity(jnp.asarray([0.6]),
                                               jnp.asarray([0.0]))))
        np.testing.assert_allclose(val, (1 - 0.36) ** 2, rtol=1e-12)

    def test_make_apodization_forms(self):
        assert isinstance(ap.make_apodization("uniform"),
                          ap.UniformApodization)
        g = ap.make_apodization(("gaussian", {"sigma": 2.0}))
        assert isinstance(g, ap.GaussianApodization) and g.sigma == 2.0
        same = ap.make_apodization(g)
        assert same is g
        with pytest.raises((KeyError, ValueError)):
            ap.make_apodization("bogus")

    def test_gaussian_parity_vs_reference(self, reference):
        from optiland.apodization import GaussianApodization as RefGauss

        rng = np.random.default_rng(0)
        Px = rng.uniform(-1, 1, 64)
        Py = rng.uniform(-1, 1, 64)
        ref = RefGauss(sigma=0.7)
        mine = ap.GaussianApodization(sigma=0.7)
        np.testing.assert_allclose(
            np.asarray(mine.get_intensity(jnp.asarray(Px),
                                          jnp.asarray(Py))),
            np.asarray(ref.get_intensity(Px, Py)), rtol=1e-10)

    def test_apodization_weights_trace_intensity(self):
        """An apodized trace carries the pupil weights into the recorded
        intensity (reference `ray_generator.py:81-85`)."""
        from optiland_tpu.models import CookeTriplet

        lens = CookeTriplet()
        lens.set_apodization(("gaussian", {"sigma": 0.5}))
        h = lens.trace(Hx=0.0, Hy=0.0, num_rays=16,
                       distribution="line_y")
        inten = np.asarray(h.intensity[0])
        # even line_y count has no exact Py=0 sample; near-axis ~ 1
        assert inten.max() > 0.98
        assert inten.min() < 0.2  # edge rays strongly attenuated
        # exactly the Gaussian of the pupil coordinate
        Py = np.linspace(-1, 1, 16)
        np.testing.assert_allclose(inten, np.exp(-Py**2 / (2 * 0.25)),
                                   rtol=1e-6)
