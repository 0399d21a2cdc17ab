"""Polarization golden suite (VERDICT r4 item 3): Malus's law through
linear polarizers, retarder state conversion, Fresnel-coefficient physics
(Brewster, normal incidence), PRT unitarity for lossless interactions,
crossed-polarizer extinction through a real trace, and parity vs the
mounted reference Jones classes (`optiland/jones.py`,
`rays/polarized_rays.py`)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from optiland_tpu.polarization import PolarizationState, jones, prt


def _k(n=1):
    """+z propagation directions."""
    return jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))


def _field_intensity(E):
    return float(np.sum(np.abs(np.asarray(E)) ** 2))


class TestJonesGoldens:
    def test_polarizer_h_passes_x_blocks_y(self):
        k = _k()
        J = jones.polarizer_h(k, k)
        J = np.asarray(J)[0]
        np.testing.assert_allclose(np.abs(J[0, 0]), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.abs(J[1, 1]), 0.0, atol=1e-12)

    @pytest.mark.parametrize("theta_deg", [0.0, 30.0, 45.0, 60.0, 90.0])
    def test_malus_law(self, theta_deg):
        """x-polarized light through a linear polarizer at angle theta:
        transmitted intensity = cos^2(theta)."""
        k = _k()
        th = math.radians(theta_deg)
        axis = (math.cos(th), math.sin(th), 0.0)
        J = jones.linear_polarizer(k, k, axis)
        E_in = jnp.asarray([[1.0 + 0j, 0.0 + 0j]])
        E_out = jnp.einsum("nij,nj->ni", J[:, :2, :2].astype(jnp.complex64),
                           E_in.astype(jnp.complex64))
        np.testing.assert_allclose(_field_intensity(E_out),
                                   math.cos(th) ** 2, atol=1e-6)

    def test_quarter_wave_makes_circular(self):
        """45-degree linear light through a QWP at 0 degrees becomes
        circular: |Ex| == |Ey| with a 90-degree relative phase."""
        k = _k()
        J = np.asarray(jones.quarter_wave_retarder(k, k))[0][:2, :2]
        E_in = np.array([1.0, 1.0]) / math.sqrt(2)
        E_out = J @ E_in
        np.testing.assert_allclose(abs(E_out[0]), abs(E_out[1]), rtol=1e-7)
        dphi = np.angle(E_out[1]) - np.angle(E_out[0])
        np.testing.assert_allclose(abs(math.sin(dphi)), 1.0, atol=1e-7)

    def test_half_wave_flips_linear(self):
        """HWP at angle t rotates linear polarization by 2t: at t=45deg,
        x-polarized becomes y-polarized."""
        k = _k()
        J = np.asarray(jones.half_wave_retarder(k, k,
                                                theta=math.pi / 4))[0][:2, :2]
        E_out = J @ np.array([1.0, 0.0])
        np.testing.assert_allclose(abs(E_out[0]), 0.0, atol=1e-7)
        np.testing.assert_allclose(abs(E_out[1]), 1.0, atol=1e-7)

    def test_retarder_is_unitary(self):
        k = _k()
        for J in (jones.quarter_wave_retarder(k, k),
                  jones.half_wave_retarder(k, k, theta=0.3),
                  jones.linear_retarder(k, k, 1.234)):
            M = np.asarray(J)[0][:2, :2]
            np.testing.assert_allclose(M @ M.conj().T, np.eye(2),
                                       atol=1e-7)

    def test_diattenuator_transmissions(self):
        k = _k()
        J = np.asarray(jones.linear_diattenuator(k, k, t_min=0.2,
                                                 t_max=0.9))[0][:2, :2]
        # t_min/t_max are AMPLITUDE coefficients (reference
        # `jones.py:262-272`): intensity transmission is their square
        np.testing.assert_allclose(abs(J[0, 0]), 0.9, rtol=1e-6)
        np.testing.assert_allclose(abs(J[1, 1]), 0.2, rtol=1e-6)

    def test_circular_polarizers_are_orthogonal(self):
        k = _k()
        R = np.asarray(jones.polarizer_rcp(k, k))[0][:2, :2]
        L = np.asarray(jones.polarizer_lcp(k, k))[0][:2, :2]
        # RCP then LCP blocks everything
        np.testing.assert_allclose(L @ R, 0.0, atol=1e-7)
        # each is idempotent (a projector)
        np.testing.assert_allclose(R @ R, R, atol=1e-7)

    def test_fresnel_normal_incidence(self):
        """At normal incidence rs == rp (up to the p sign convention) and
        R = ((n1-n2)/(n1+n2))^2."""
        k = _k()
        aoi = jnp.asarray([0.0])
        J = np.asarray(jones.fresnel(k, k, aoi, 1.0, 1.5, reflect=True))[0]
        r = (1.0 - 1.5) / (1.0 + 1.5)
        np.testing.assert_allclose(abs(J[0, 0]) ** 2, r * r, rtol=1e-7)
        np.testing.assert_allclose(abs(J[1, 1]) ** 2, r * r, rtol=1e-7)

    def test_fresnel_brewster_zero_rp(self):
        k = _k()
        theta_b = math.atan(1.5)
        J = np.asarray(jones.fresnel(k, k, jnp.asarray([theta_b]), 1.0,
                                     1.5, reflect=True))[0]
        assert abs(J[1, 1]) ** 2 < 1e-10  # p-reflectance vanishes
        assert abs(J[0, 0]) ** 2 > 0.05   # s does not

    def test_fresnel_energy_conservation(self):
        """|r|^2 + (n2 cos t2)/(n1 cos t1) |t|^2 == 1 per polarization."""
        k = _k()
        n1, n2 = 1.0, 1.52
        for aoi_deg in (0.0, 25.0, 60.0):
            aoi = math.radians(aoi_deg)
            t2 = math.asin(n1 * math.sin(aoi) / n2)
            Jr = np.asarray(jones.fresnel(k, k, jnp.asarray([aoi]), n1, n2,
                                          reflect=True))[0]
            Jt = np.asarray(jones.fresnel(k, k, jnp.asarray([aoi]), n1, n2,
                                          reflect=False))[0]
            fac = (n2 * math.cos(t2)) / (n1 * math.cos(aoi))
            for i in range(2):
                total = abs(Jr[i, i]) ** 2 + fac * abs(Jt[i, i]) ** 2
                np.testing.assert_allclose(total, 1.0, rtol=1e-6)

    def test_jones_parity_vs_reference(self, reference):
        import optiland.backend as be

        be.set_backend("numpy")
        from optiland.jones import (JonesLinearDiattenuator,
                                    JonesQuarterWaveRetarder)
        from optiland.rays import RealRays

        n = 4
        rays = RealRays(np.zeros(n), np.zeros(n), np.zeros(n), np.zeros(n),
                        np.zeros(n), np.ones(n), np.ones(n),
                        np.full(n, 0.55))
        # pre-surface directions (set during tracing; needed by the Jones
        # classes' local-basis computation)
        rays.L0, rays.M0, rays.N0 = rays.L, rays.M, rays.N
        ref_q = np.asarray(
            JonesQuarterWaveRetarder(theta=0.4).calculate_matrix(rays))
        k = _k(n)
        mine_q = np.asarray(jones.quarter_wave_retarder(k, k, theta=0.4))
        np.testing.assert_allclose(mine_q[:, :2, :2], ref_q[:, :2, :2],
                                   atol=1e-8)
        ref_d = np.asarray(JonesLinearDiattenuator(
            t_min=0.1, t_max=0.8, theta=0.0).calculate_matrix(rays))
        mine_d = np.asarray(jones.linear_diattenuator(k, k, 0.1, 0.8))
        np.testing.assert_allclose(mine_d[:, :2, :2], ref_d[:, :2, :2],
                                   atol=1e-8)


class TestPRTGoldens:
    def test_identity_when_no_interaction(self):
        k = _k(5)
        P = np.asarray(prt.surface_prt(k, k))
        np.testing.assert_allclose(
            P, np.broadcast_to(np.eye(3), P.shape), atol=1e-7)

    def test_fold_mirror_prt_is_orthogonal(self):
        """A bare 90-degree fold (no Jones) is a pure rotation: the PRT
        matrix must be orthogonal (lossless)."""
        k0 = _k()
        k1 = jnp.asarray([[0.0, 1.0, 0.0]])
        P = np.asarray(prt.surface_prt(k0, k1))[0]
        np.testing.assert_allclose(P @ P.T, np.eye(3), atol=1e-6)

    def test_local_basis_orthonormal(self):
        rng = np.random.default_rng(0)
        k0 = rng.normal(size=(16, 3))
        k0 /= np.linalg.norm(k0, axis=1, keepdims=True)
        k1 = k0 + 0.3 * rng.normal(size=(16, 3))
        k1 /= np.linalg.norm(k1, axis=1, keepdims=True)
        s, p0, p1, o_in, o_out = prt.local_basis(jnp.asarray(k0),
                                                 jnp.asarray(k1))
        s, p0, p1 = np.asarray(s), np.asarray(p0), np.asarray(p1)
        np.testing.assert_allclose(np.linalg.norm(s, axis=1), 1.0,
                                   rtol=1e-6)
        # s perpendicular to both propagation directions
        np.testing.assert_allclose(np.sum(s * k0, axis=1), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.sum(s * k1, axis=1), 0.0, atol=1e-6)
        # right-handed triads
        np.testing.assert_allclose(np.sum(p0 * k0, axis=1), 0.0, atol=1e-6)

    def test_initial_field_matches_state(self):
        k = _k()
        E = np.asarray(prt.initial_field(k, PolarizationState(
            True, 1.0, 0.0, 0.0, 0.0)))[0]
        # x-polarized +z ray: field along a transverse unit vector
        np.testing.assert_allclose(np.abs(E[2]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.linalg.norm(E), 1.0, rtol=1e-6)

    def test_unpolarized_intensity_preserved_identity(self):
        k = _k(3)
        P = prt.identity_prt(3)
        i0 = jnp.asarray([1.0, 0.5, 0.25])
        out = np.asarray(prt.intensity_from_prt(
            P, k, i0, PolarizationState.unpolarized()))
        np.testing.assert_allclose(out, np.asarray(i0), rtol=1e-6)


class TestPolarizedTrace:
    def _polarizer_system(self, coat1, coat2):
        from optiland_tpu import Optic

        lens = Optic()
        lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
        lens.add_surface(index=1, radius=np.inf, thickness=5.0,
                         is_stop=True, coating=coat1)
        lens.add_surface(index=2, radius=np.inf, thickness=5.0,
                         coating=coat2)
        lens.add_surface(index=3)
        lens.set_aperture(aperture_type="EPD", value=4)
        lens.set_field_type("angle")
        lens.add_field(y=0)
        lens.add_wavelength(value=0.55, is_primary=True)
        lens.set_polarization(PolarizationState(True, 1.0, 0.0, 0.0, 0.0))
        return lens

    def test_crossed_polarizers_extinguish(self):
        lens = self._polarizer_system("polarizer_h", "polarizer_v")
        h = lens.trace(Hx=0.0, Hy=0.0, num_rays=8)
        np.testing.assert_allclose(np.asarray(h.intensity[-1]), 0.0,
                                   atol=1e-10)

    def test_parallel_polarizers_transmit(self):
        lens = self._polarizer_system("polarizer_h", "polarizer_h")
        h = lens.trace(Hx=0.0, Hy=0.0, num_rays=8)
        np.testing.assert_allclose(np.asarray(h.intensity[-1]), 1.0,
                                   atol=1e-6)

    def test_unpolarized_through_polarizer_halves(self):
        lens = self._polarizer_system("polarizer_h", None)
        lens.set_polarization("unpolarized")
        h = lens.trace(Hx=0.0, Hy=0.0, num_rays=8)
        np.testing.assert_allclose(np.asarray(h.intensity[-1]), 0.5,
                                   atol=1e-6)
