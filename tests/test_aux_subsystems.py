"""Aux-subsystem close-out (VERDICT r2 item 8, SURVEY §5 rows 1, 2, 4, 5):
orbax checkpoint/resume for optimizer + Monte-Carlo state, step metrics via
the callback hook, and a checkify/debug_nans pass over the kernel suite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optiland_tpu.models import CookeTriplet


def _problem():
    from optiland_tpu.optimization.problem import OptimizationProblem

    lens = CookeTriplet()
    p = OptimizationProblem()
    p.add_operand(operand_type="f2", target=55.0, weight=1.0,
                  input_data={})
    p.add_variable(lens, "radius", surface_number=1)
    p.add_variable(lens, "radius", surface_number=3)
    return lens, p


def test_optax_checkpoint_resume(tmp_path):
    from optiland_tpu.optimization.optimizers import AdamOptimizer

    ckpt = str(tmp_path / "ckpt")
    _, p1 = _problem()
    opt1 = AdamOptimizer(p1, lr=1e-2)
    r1 = opt1.optimize(n_steps=6, checkpoint_dir=ckpt, checkpoint_every=3)

    # fresh problem, resume from step 3 checkpoint... run only steps 3..6
    from optiland_tpu.utils.checkpoint import latest_checkpoint

    assert latest_checkpoint(ckpt) is not None
    _, p2 = _problem()
    opt2 = AdamOptimizer(p2, lr=1e-2)
    # drop the step-6 checkpoint so resume starts at 3
    import shutil

    last = latest_checkpoint(ckpt)
    shutil.rmtree(last)
    r2 = opt2.optimize(n_steps=6, checkpoint_dir=ckpt, resume=True)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x),
                               rtol=1e-6, atol=1e-9)


def test_optax_step_metrics():
    from optiland_tpu.optimization.optimizers import AdamOptimizer

    _, p = _problem()
    metrics = []
    AdamOptimizer(p, lr=1e-2).optimize(n_steps=4, metrics=metrics)
    assert len(metrics) == 4
    for m in metrics:
        assert np.isfinite(m["loss"])
        assert np.isfinite(m["grad_norm"]) and m["grad_norm"] >= 0
        assert m["step_time_s"] > 0 and m["evals_per_s"] > 0


def test_monte_carlo_chunked_checkpoint(tmp_path):
    from optiland_tpu.tolerancing import MonteCarlo, Tolerancing
    from optiland_tpu.tolerancing.core import NormalSampler

    lens = CookeTriplet()
    tol = Tolerancing(lens)
    tol.add_perturbation("radius", NormalSampler(22.01359, 0.05),
                         surface_number=1)
    tol.add_operand(operand_type="f2")
    mc = MonteCarlo(tol)

    full = mc.run(8, seed=1)
    ckpt = str(tmp_path / "mc")
    chunked = mc.run(8, seed=1, chunk_size=3, checkpoint_dir=ckpt)
    pd_testing = pytest.importorskip("pandas.testing")
    pd_testing.assert_frame_equal(full, chunked)

    # resume path: restore from the first chunk's checkpoint
    import shutil

    from optiland_tpu.utils.checkpoint import latest_checkpoint

    while True:
        last = latest_checkpoint(ckpt)
        if last is None or last.endswith("00000001"):
            break
        shutil.rmtree(last)
    resumed = mc.run(8, seed=1, chunk_size=3, checkpoint_dir=ckpt)
    pd_testing.assert_frame_equal(full, resumed)


def test_prng_checkpoint_roundtrip(tmp_path):
    from optiland_tpu.utils.checkpoint import (
        prng_to_state,
        restore_checkpoint,
        save_checkpoint,
        state_to_prng,
    )

    key = jax.random.PRNGKey(42)
    save_checkpoint(str(tmp_path / "k"), 1, {"prng": prng_to_state(key)})
    state = restore_checkpoint(str(tmp_path / "k"))
    key2 = state_to_prng(state["prng"])
    np.testing.assert_array_equal(
        np.asarray(jax.random.uniform(key, (4,))),
        np.asarray(jax.random.uniform(key2, (4,))))


def test_checkify_trace_clean():
    """checkify pass over the trace + merit gradient: no NaN/inf or
    div-by-zero escapes the kernel on a healthy system (SURVEY §5 race/
    sanitizer row)."""
    from jax.experimental import checkify

    from optiland_tpu.trace.tracer import trace_system

    lens = CookeTriplet()
    static, params = lens.build()

    def merit(p):
        h = trace_system(static, p, jnp.zeros(16), jnp.full(16, 0.7),
                         jnp.linspace(-0.9, 0.9, 16), jnp.zeros(16), 0.55)
        i = h.intensity[-1]
        return jnp.sum((h.x[-1] ** 2 + h.y[-1] ** 2) * i) / (jnp.sum(i) + 1e-9)

    checked = checkify.checkify(
        lambda p: jax.value_and_grad(merit)(p),
        errors=checkify.float_checks)
    err, (loss, grads) = jax.jit(checked)(params)
    # float_checks flags any NaN/inf produced anywhere in the graph
    err.throw()  # raises if a check fired
    assert np.isfinite(float(loss))


def test_debug_nans_trace_clean():
    from optiland_tpu.trace.tracer import trace_system

    lens = CookeTriplet()
    static, params = lens.build()
    with jax.debug_nans(True):
        h = trace_system(static, params, jnp.zeros(8), jnp.full(8, 0.5),
                         jnp.linspace(-0.8, 0.8, 8), jnp.zeros(8), 0.55)
        np.asarray(h.y[-1])
