"""The examples gallery must keep running (reference keeps its tutorials
executable via doc builds; we smoke-run each script's main() with small
sizes). GUI example runs headless (services only)."""

import importlib
import pathlib
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _run(name, **kwargs):
    sys.path.insert(0, str(EXAMPLES))
    try:
        mod = importlib.import_module(name)
        return mod.main(**kwargs)
    finally:
        sys.path.remove(str(EXAMPLES))


@pytest.mark.parametrize("name,kwargs", [
    ("01_hello_cooke_triplet", {"num_rings": 3}),
    ("02_save_load_and_zemax", {}),
    ("03_differentiable_hello", {}),
    ("04_aberrations", {}),
    ("05_opd_psf_mtf_zernike", {}),
    ("06_polarization_coatings", {}),
    ("07_thin_films", {}),
    ("08_optimization", {}),
    ("09_glass_expert", {"maxiter": 2}),
    ("10_tolerancing", {"draws": 16}),
    ("11_aspheres_freeforms", {}),
    ("12_multiconfig_zoom", {}),
    ("13_image_simulation", {"size": 32}),
    ("14_tpu_sharded_trace", {"n_rays": 1 << 12}),
    ("15_gui", {"show": False}),
], ids=lambda p: p if isinstance(p, str) else "")
def test_example_runs(name, kwargs):
    _run(name, **kwargs)


@pytest.mark.skipif("OPTILAND_TPU_RUN_SLOW_EXAMPLES" not in
                    __import__("os").environ,
                    reason="GlassExpert walk is minutes-long; run with "
                           "OPTILAND_TPU_RUN_SLOW_EXAMPLES=1")
def test_glass_expert_example():
    _run("09_glass_expert")
