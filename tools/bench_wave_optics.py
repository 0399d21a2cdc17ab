"""On-chip wave-optics benchmark (VERDICT r4 item 5).

Runs the FFT PSF pipeline (trace -> pupil grid -> zero-pad -> fft2, all
complex64 on TPU per the r4 complex policy) and the Pallas Huygens-Fresnel
summation kernel on the REAL chip, records throughput, and checks parity
against the CPU float64 path. Appends a JSON line per benchmark to stdout;
results are transcribed into PERF.md.

Run on the default (axon) platform:  python tools/bench_wave_optics.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def _timed(fn, reps=8):
    """min-of-reps wall time with a true host-readback barrier
    (PERF.md measurement rules)."""
    out = fn()
    out = tuple(np.asarray(o) for o in out) if isinstance(out, tuple) \
        else np.asarray(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        _ = (tuple(np.asarray(o) for o in r) if isinstance(r, tuple)
             else np.asarray(r))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax

    platform = jax.devices()[0].platform
    print(f"# platform: {platform}", file=sys.stderr)

    from optiland_tpu import set_precision
    from optiland_tpu.models import CookeTriplet

    set_precision("float32")
    lens = CookeTriplet()
    static, params = lens.build()

    # ---------------- FFT PSF ----------------
    import jax.numpy as jnp

    from optiland_tpu.psf.fft import _psf_from_pupils, _pupil_grid

    num_rays, grid = 128, 1024

    @jax.jit
    def fft_psf(params, wls):
        pupils = jax.vmap(
            lambda w: _pupil_grid(static, params, 0.0, 0.0, w, num_rays,
                                  "chief_ray", "paraxial"))(wls)
        return _psf_from_pupils(pupils, grid)

    wls = jnp.asarray([lens.primary_wavelength], params.cv.dtype)
    t, psf_dev = _timed(lambda: fft_psf(params, wls))
    c = psf_dev.shape[0] // 2
    print(json.dumps({
        "metric": "fft_psf_1024_grid_seconds", "value": t, "unit": "s",
        "platform": platform,
        "pixels_per_s": grid * grid / t,
        "strehl": float(psf_dev[c, c]) / 100.0,
    }))

    # ---------------- Pallas Huygens ----------------
    from optiland_tpu.psf.huygens import (huygens_sum_pallas,
                                          huygens_sum_xla)

    n_pupil = 8192
    n_img = 128 * 128
    rng = np.random.default_rng(0)
    f32 = np.float32
    pupil_xyz = tuple(jnp.asarray(rng.uniform(-5, 5, n_pupil), f32)
                      for _ in range(2)) + (
        jnp.asarray(np.zeros(n_pupil), f32),)
    image_xyz = tuple(jnp.asarray(rng.uniform(-0.05, 0.05, n_img), f32)
                      for _ in range(2)) + (
        jnp.asarray(np.full(n_img, 60.0), f32),)
    amp = jnp.asarray(rng.uniform(0.5, 1.0, n_pupil), f32)
    opd = jnp.asarray(rng.uniform(0, 20, n_pupil), f32)
    wl_mm = 0.55e-3
    Rp = 60.0

    import functools

    pallas_fn = jax.jit(functools.partial(huygens_sum_pallas,
                                          wavelength_mm=wl_mm, Rp=Rp))
    t_pal, out_pal = _timed(lambda: pallas_fn(image_xyz, pupil_xyz, amp,
                                              opd))
    contribs_per_s = n_pupil * n_img / t_pal
    print(json.dumps({
        "metric": "huygens_pallas_8192x16384_seconds", "value": t_pal,
        "unit": "s", "platform": platform,
        "phasor_contribs_per_s": contribs_per_s,
    }))

    # parity: Pallas f32 vs XLA f32 on-device, and vs f64 CPU
    xla_fn = jax.jit(functools.partial(huygens_sum_xla,
                                       wavelength_mm=wl_mm, Rp=Rp))
    out_xla = np.asarray(xla_fn(image_xyz, pupil_xyz, amp, opd))
    rel = np.max(np.abs(out_pal - out_xla)) / np.max(np.abs(out_xla))
    cpu = jax.devices("cpu")
    rel64 = None
    if cpu:
        with jax.default_device(cpu[0]):
            img64 = tuple(jnp.asarray(np.asarray(a), jnp.float32)
                          for a in image_xyz)
            pup64 = tuple(jnp.asarray(np.asarray(a), jnp.float32)
                          for a in pupil_xyz)
            out_cpu = np.asarray(huygens_sum_xla(
                img64, pup64, jnp.asarray(np.asarray(amp)),
                jnp.asarray(np.asarray(opd)), wl_mm, Rp))
        rel64 = float(np.max(np.abs(out_pal - out_cpu))
                      / np.max(np.abs(out_cpu)))
    print(json.dumps({
        "metric": "huygens_pallas_vs_xla_rel_err", "value": float(rel),
        "unit": "rel", "vs_cpu_rel_err": rel64,
    }))


if __name__ == "__main__":
    main()
