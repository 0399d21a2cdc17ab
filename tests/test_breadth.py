"""Breadth tests: scatter BSDFs, multiconfig, extended sources."""

import numpy as np
import pytest

import optiland_tpu  # noqa: F401
from optiland_tpu.models import CookeTriplet


def _flat_plate():
    from optiland_tpu.system.optic import Optic

    lens = Optic()
    lens.add_surface(index=0, radius=np.inf, thickness=np.inf)
    lens.add_surface(index=1, radius=np.inf, thickness=10.0, is_stop=True)
    lens.add_surface(index=2)
    lens.set_aperture("EPD", 4.0)
    lens.add_wavelength(0.55)
    return lens


def test_gaussian_bsdf_statistics():
    from optiland_tpu.core.scatter import GaussianBSDF

    lens = _flat_plate()
    lens.surfaces.specs[1].bsdf = GaussianBSDF(0.05)
    lens._dirty()
    h = lens.trace(num_rays=10)
    M = np.asarray(h.M[-1])
    assert abs(M.std() - 0.05) < 0.02
    assert np.all(np.asarray(h.N[-1]) > 0)


def test_lambertian_bsdf_forward_hemisphere():
    from optiland_tpu.core.scatter import LambertianBSDF

    lens = _flat_plate()
    lens.surfaces.specs[1].bsdf = LambertianBSDF()
    lens._dirty()
    h = lens.trace(num_rays=10)
    N = np.asarray(h.N[-1])
    assert np.all(N > 0)
    assert N.std() > 0.1  # broad angular spread


def test_multiconfig_zoom():
    from optiland_tpu.system.multiconfig import MultiConfiguration

    base = CookeTriplet()
    mc = MultiConfiguration(base)
    cfg2 = mc.add_configuration(unlink=((6, "thickness"),))
    assert len(mc) == 2
    # zoom: change the image gap only in config 2
    cfg2.surfaces.specs[6].thickness = 45.0
    cfg2._dirty()
    mc.update()
    f2_base = float(base.paraxial.f2())
    f2_cfg2 = float(cfg2.paraxial.f2())
    np.testing.assert_allclose(f2_base, f2_cfg2, rtol=1e-10)  # same glass/radii
    # but image distances differ
    assert base.surfaces.specs[6].thickness != cfg2.surfaces.specs[6].thickness
    # linked attribute propagates from base
    base.surfaces.specs[1].radius = 23.0
    mc.update()
    assert cfg2.surfaces.specs[1].radius == 23.0


def test_smf_source_trace():
    from optiland_tpu.sources import SMFSource
    from optiland_tpu.sources.base import trace_source

    lens = _flat_plate()
    src = SMFSource(mfd_um=10.0, wavelength_um=1.55,
                    position=(0.0, 0.0, -5.0))
    hist = trace_source(lens, src, 256)
    i = np.asarray(hist.intensity[-1])
    assert i.shape[0] == 256
    np.testing.assert_allclose(i.sum(), 1.0, rtol=1e-6)  # power conserved
    # Gaussian angular spread maps to a spot at the image plane
    y = np.asarray(hist.y[-1])
    assert 0 < y.std() < 5.0


def test_smf_source_validation():
    from optiland_tpu.sources import SMFSource

    with pytest.raises(ValueError):
        SMFSource(mfd_um=10.0, wavelength_um=1.55).generate_rays(0)
