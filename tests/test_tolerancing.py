"""Tolerancing: batched Monte Carlo + compensation + sensitivity, including
mesh-sharded draws on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet
from optiland_tpu.tolerancing import (
    MonteCarlo,
    NormalSampler,
    RangeSampler,
    ScalarSampler,
    SensitivityAnalysis,
    Tolerancing,
)


@pytest.fixture()
def tol():
    lens = CookeTriplet()
    t = Tolerancing(lens)
    t.add_perturbation("radius", NormalSampler(22.01359, 0.05),
                       surface_number=1)
    t.add_perturbation("thickness", NormalSampler(4.75041, 0.02),
                       surface_number=4)
    t.add_operand("f2")
    t.add_operand("rms_spot_size", input_data={
        "surface_number": -1, "Hx": 0, "Hy": 0.0, "num_rays": 3,
        "wavelength": 0.55})
    return t


def test_monte_carlo_runs(tol):
    mc = MonteCarlo(tol)
    df = mc.run(32, seed=1)
    assert len(df) == 32
    f2_col = [c for c in df.columns if "f2" in c][0]
    f2 = df[f2_col].to_numpy()
    assert np.all(np.isfinite(f2))
    assert f2.std() > 1e-4  # perturbations actually move the metric
    assert abs(f2.mean() - 50.1) < 1.0


def test_monte_carlo_zero_perturbation_matches_nominal():
    lens = CookeTriplet()
    t = Tolerancing(lens)
    t.add_perturbation("radius", ScalarSampler(22.01359), surface_number=1)
    t.add_operand("f2")
    mc = MonteCarlo(t)
    df = mc.run(4)
    f2_nominal = float(lens.paraxial.f2())
    col = [c for c in df.columns if "f2" in c][0]
    np.testing.assert_allclose(df[col].to_numpy(), f2_nominal, rtol=1e-10)


def test_compensator_recovers_focus(tol):
    """A defocus perturbation compensated by the image-gap thickness."""
    lens = CookeTriplet()
    t = Tolerancing(lens, compensator_steps=8)
    t.add_perturbation("thickness", ScalarSampler(44.0),
                       surface_number=6)  # nominal 42.208 -> defocus
    t.add_compensator("thickness", surface_number=6)
    t.add_operand("rms_spot_size", input_data={
        "surface_number": -1, "Hx": 0, "Hy": 0.0, "num_rays": 3,
        "wavelength": 0.55})
    mc = MonteCarlo(t)
    df = mc.run(2)
    comp_col = [c for c in df.columns if c.startswith("C0")][0]
    rms_col = [c for c in df.columns if "rms" in c][0]
    # compensator should pull the thickness back near nominal and the spot
    # back near its nominal size
    assert abs(df[comp_col].iloc[0] - 42.20778) < 0.3
    assert df[rms_col].iloc[0] < 0.01


def test_monte_carlo_sharded(tol):
    from optiland_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    mc = MonteCarlo(tol, mesh=mesh)
    df = mc.run(24, seed=2)  # 24 pads to 8-divisible
    assert len(df) == 24
    # same seed without mesh gives identical results
    df2 = MonteCarlo(tol).run(24, seed=2)
    f2c = [c for c in df.columns if "f2" in c][0]
    np.testing.assert_allclose(df[f2c].to_numpy(), df2[f2c].to_numpy(),
                               rtol=1e-12)


def test_sensitivity_analysis(tol):
    lens = CookeTriplet()
    t = Tolerancing(lens)
    t.add_perturbation("radius", RangeSampler(21.8, 22.2, 5),
                       surface_number=1)
    t.add_operand("f2")
    sa = SensitivityAnalysis(t)
    df = sa.run()
    assert len(df) == 5
    col = [c for c in df.columns if "f2" in c][0]
    # f2 decreases monotonically as R1 grows... (power drops -> f grows);
    # just require a monotone, finite sweep
    v = df[col].to_numpy()
    assert np.all(np.isfinite(v))
    assert np.all(np.diff(v) > 0) or np.all(np.diff(v) < 0)
