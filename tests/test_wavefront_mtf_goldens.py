"""Wavefront/OPD/MTF physics goldens (VERDICT r4 item 3): diffraction-
limited invariants with known closed forms — a perfect (paraxial) lens has
zero OPD and Strehl 1; pure defocus OPD is quadratic in pupil radius with
the textbook W020 coefficient; the diffraction-limited incoherent MTF is
the autocorrelation chat function with cutoff 1/(lambda FNO) — plus
defocus-vs-reference parity."""


import numpy as np

import jax.numpy as jnp

from optiland_tpu import Optic


def _perfect_lens(f=100.0, epd=10.0, defocus=0.0):
    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, surface_type="paraxial", f=f,
                     thickness=f + defocus, is_stop=True)
    lens.add_surface(index=2)
    lens.set_aperture(aperture_type="EPD", value=epd)
    lens.set_field_type("angle")
    lens.add_field(y=0)
    lens.add_wavelength(value=0.55, is_primary=True)
    return lens


class TestWavefrontGoldens:
    def test_perfect_lens_near_zero_opd(self):
        """An ideal thin lens at f/10 leaves only the 4th-order residual
        r^4/(8 f^3) of the paraxial phase transformation: 0.142 waves at
        the pupil edge here, and exactly zero through 2nd order.

        (Deliberate deviation from the reference: its
        `thin_lens_interaction_model.py:68-71` "workaround for now" keeps
        UNNORMALIZED directions after the lens, so its own wavefront
        module reports an r^2/(2f)-scale error — 227 waves on this very
        system — see test_reference_thin_lens_workaround below.)"""
        from optiland_tpu.wavefront.core import wavefront_data

        lens = _perfect_lens()
        static, params = lens.build()
        rng = np.random.default_rng(0)
        r = np.sqrt(rng.uniform(0, 1, 64))
        th = rng.uniform(0, 2 * np.pi, 64)
        data = wavefront_data(static, params, 0.0, 0.0,
                              jnp.asarray(r * np.cos(th)),
                              jnp.asarray(r * np.sin(th)), 0.55)
        opd = np.asarray(data.opd)
        # r^4/(8 f^3) bound: (epd/2)^4/(8 f^3) / lambda_mm
        bound = (5.0 ** 4 / (8 * 100.0 ** 3)) / 0.55e-3
        assert np.max(np.abs(opd)) < 1.1 * bound
        # through 2nd order it vanishes: inner third of the pupil is clean
        inner = r < 0.33
        assert np.max(np.abs(opd[inner])) < 0.01

    def test_defocus_opd_quadratic(self):
        """Longitudinal defocus dz gives W020 = dz / (8 FNO^2) of
        quadratic OPD (dz large enough that the lens's r^4 residual is
        negligible against it)."""
        from optiland_tpu.wavefront.core import wavefront_data

        f, epd, dz, wl = 100.0, 10.0, 0.5, 0.55
        lens = _perfect_lens(f, epd, defocus=dz)
        static, params = lens.build()
        rho = np.linspace(0.05, 0.8, 10)
        data = wavefront_data(static, params, 0.0, 0.0,
                              jnp.asarray(rho), jnp.zeros(10), wl)
        opd_waves = np.asarray(data.opd)
        fno = f / epd
        w020_waves = dz / (8 * fno * fno) / (wl * 1e-3)  # wl um -> mm
        # separate the quadratic defocus from the lens's known rho^4
        # residual: a [rho^2, rho^4] least-squares basis
        A = np.c_[rho ** 2, rho ** 4]
        c, *_ = np.linalg.lstsq(A, opd_waves, rcond=None)
        np.testing.assert_allclose(abs(c[0]), abs(w020_waves), rtol=0.01)
        # and the rho^4 term IS the r^4/(8 f^3) residual
        r4_waves = (epd / 2) ** 4 / (8 * f ** 3) / (wl * 1e-3)
        np.testing.assert_allclose(abs(c[1]), r4_waves, rtol=0.05)

    def test_reference_thin_lens_workaround(self, reference):
        """DOCUMENTED DEVIATION: the reference's ideal-lens OPD is an
        acknowledged workaround (`thin_lens_interaction_model.py:68`
        "workaround for now / TODO") that leaves directions unnormalized
        after the lens, so its wavefront module reports ~r^2/(2f)-scale
        error for a PERFECT lens (measured here: hundreds of waves). Our
        implementation normalizes directions and applies the same phase
        transformation, leaving only the true 4th-order residual."""
        import optiland.backend as be

        be.set_backend("numpy")
        from optiland.optic import Optic as RefOptic
        from optiland.wavefront import Wavefront

        ref = RefOptic()
        ref.add_surface(index=0, radius=np.inf, thickness=np.inf)
        ref.add_surface(index=1, surface_type="paraxial", f=100.0,
                        thickness=100.0, is_stop=True)
        ref.add_surface(index=2)
        ref.set_aperture(aperture_type="EPD", value=10.0)
        ref.set_field_type("angle")
        ref.add_field(y=0)
        ref.add_wavelength(value=0.55, is_primary=True)
        wf = Wavefront(ref, distribution="line_y", num_rays=9)
        ref_opd = np.abs(np.asarray(wf.get_data((0.0, 0.0), 0.55).opd))
        # the reference's perfect lens: ~r^2/(2f)/lambda at the pupil edge
        expect_edge = (5.0 ** 2 / (2 * 100.0)) / 0.55e-3
        np.testing.assert_allclose(ref_opd.max(), expect_edge, rtol=0.05)

        from optiland_tpu.wavefront.core import wavefront_data

        lens = _perfect_lens()
        static, params = lens.build()
        py = np.linspace(-1, 1, 9)
        data = wavefront_data(static, params, 0.0, 0.0,
                              jnp.zeros(9), jnp.asarray(py), 0.55)
        assert np.max(np.abs(np.asarray(data.opd))) < 0.2  # waves

    def test_zernike_opd_defocus_dominates(self):
        from optiland_tpu.wavefront.opd import ZernikeOPD

        lens = _perfect_lens(defocus=0.5)
        z = ZernikeOPD(lens, (0.0, 0.0), num_terms=10)
        c = np.abs(np.asarray(z.coeffs))
        # fringe term 3 (index 3) is defocus; it must dominate all
        # non-piston terms
        others = np.delete(c, [0, 3])
        assert c[3] > 10 * np.max(others)

    def test_strehl_ratio_perfect_vs_defocused(self):
        from optiland_tpu.psf.fft import ScalarFFTPSF

        # f/20 keeps the ideal lens's rho^4 residual below 0.01 waves ->
        # genuinely diffraction limited (at f/10 the residual alone puts
        # Strehl at 0.93, the physically correct value)
        perfect = ScalarFFTPSF(_perfect_lens(epd=5.0), (0.0, 0.0),
                               num_rays=64, grid_size=256)
        s0 = float(np.asarray(perfect.strehl_ratio()))
        assert s0 > 0.99
        defocused = ScalarFFTPSF(_perfect_lens(epd=5.0, defocus=1.0),
                                 (0.0, 0.0), num_rays=64, grid_size=256)
        s1 = float(np.asarray(defocused.strehl_ratio()))
        assert s1 < 0.8 * s0


class TestMTFGoldens:
    def test_diffraction_limited_mtf_curve(self):
        """A perfect lens's incoherent MTF is the pupil autocorrelation:
        MTF(nu) = 2/pi (acos(x) - x sqrt(1-x^2)), x = nu / nu_c,
        nu_c = 1/(lambda FNO)."""
        from optiland_tpu.mtf.fft import ScalarFFTMTF

        lens = _perfect_lens(epd=5.0)  # f/20: residual-free to ~0.01 wv
        m = ScalarFFTMTF(lens, num_rays=64, grid_size=256)
        freqs = np.asarray(m.freq_tang[0])
        tan = np.asarray(m.mtf[0][0])
        nu_c = 1.0 / (0.55e-3 * m.FNO[0])  # cycles/mm
        x = np.clip(freqs / nu_c, 0.0, 1.0)
        want = 2.0 / np.pi * (np.arccos(x) - x * np.sqrt(1 - x * x))
        sel = freqs < 0.9 * nu_c
        np.testing.assert_allclose(tan[sel], want[sel], atol=0.02)

    def test_mtf_cutoff_frequency(self):
        from optiland_tpu.mtf.fft import ScalarFFTMTF

        lens = _perfect_lens(epd=5.0)
        m = ScalarFFTMTF(lens, num_rays=64, grid_size=256)
        freqs = np.asarray(m.freq_tang[0])
        tan = np.asarray(m.mtf[0][0])
        nu_c = 1.0 / (0.55e-3 * m.FNO[0])
        beyond = freqs > 1.05 * nu_c
        if beyond.any():
            assert np.max(tan[beyond]) < 0.01

    def test_defocus_lowers_mtf_everywhere(self):
        from optiland_tpu.mtf.fft import ScalarFFTMTF

        m0 = ScalarFFTMTF(_perfect_lens(epd=5.0), num_rays=64,
                          grid_size=256)
        md = ScalarFFTMTF(_perfect_lens(epd=5.0, defocus=1.0), num_rays=64,
                          grid_size=256)
        f0 = np.asarray(m0.freq_tang[0])
        t0 = np.asarray(m0.mtf[0][0])
        td = np.asarray(md.mtf[0][0])
        mid = (f0 > 10) & (f0 < 60)
        assert np.mean(td[mid]) < np.mean(t0[mid])

    def test_sampled_mtf_matches_fft_at_low_freq(self):
        from optiland_tpu.mtf.fft import ScalarFFTMTF
        from optiland_tpu.mtf.sampled import SampledMTF

        lens = _perfect_lens(epd=5.0)
        mf = ScalarFFTMTF(lens, num_rays=64, grid_size=256)
        freqs = np.asarray(mf.freq_tang[0])
        tan = np.asarray(mf.mtf[0][0])
        probe = [10.0, 30.0, 50.0]
        ms = SampledMTF(lens, (0.0, 0.0), num_rays=64)
        got = np.asarray(ms.calculate_mtf([(f, 0.0) for f in probe]))
        want = np.interp(probe, freqs, tan)
        np.testing.assert_allclose(got, want, atol=0.03)
