"""Optimizers over a compiled OptimizationProblem.

Mirrors the reference's optimizer suite (`optimization/optimizer/scipy/*.py`,
`optimizer/torch/*.py`): scipy minimize / least_squares / global methods
driven by the jitted merit (with exact JAX gradients instead of finite
differences), and on-device Adam/SGD loops via optax (the reference's torch
Adam counterpart, `optimizer/torch/adam.py:31`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class OptimizationResult(dict):
    """scipy-style result wrapper."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


class OptimizerGeneric:
    """scipy.optimize.minimize wrapper with analytic gradients
    (reference `optimizer/scipy/base.py:25-138` + undo stack)."""

    method = None

    def __init__(self, problem):
        self.problem = problem
        self._undo: list[np.ndarray] = []

    def undo(self):
        if self._undo:
            x = self._undo.pop()
            self.problem.apply(x)

    def optimize(self, maxiter: int = 1000, disp: bool = False, tol: float = 1e-3,
                 callback=None):
        from scipy import optimize as sciopt

        c = self.problem._compile()
        params0 = self.problem.optic.params
        x0 = np.asarray(self.problem.x0(), float)
        self._undo.append(x0)

        def fun(x):
            v, g = c["value_and_grad"](jnp.asarray(x), params0)
            return float(v), np.asarray(g, float)

        bounds = self._bounds()
        res = sciopt.minimize(
            fun, x0, jac=True, method=self.method, tol=tol, bounds=bounds,
            options={"maxiter": maxiter, "disp": disp}, callback=callback,
        )
        self.problem.apply(res.x)
        return res

    def _bounds(self):
        bounds = []
        any_bound = False
        for v in self.problem.variables:
            lo, hi = v.bounds
            slo = None if lo is None else float(v.scaler.scale(lo))
            shi = None if hi is None else float(v.scaler.scale(hi))
            if slo is not None and shi is not None and slo > shi:
                slo, shi = shi, slo
            if slo is not None or shi is not None:
                any_bound = True
            bounds.append((slo, shi))
        return bounds if any_bound else None


class LeastSquares(OptimizerGeneric):
    """scipy.optimize.least_squares with the analytic residual Jacobian."""

    def optimize(self, maxiter: int = 1000, disp: bool = False, tol: float = 1e-9):
        from scipy import optimize as sciopt

        c = self.problem._compile()
        params0 = self.problem.optic.params
        x0 = np.asarray(self.problem.x0(), float)
        self._undo.append(x0)

        def fun(x):
            return np.asarray(c["residuals"](jnp.asarray(x), params0), float)

        def jac(x):
            return np.asarray(c["residual_jac"](jnp.asarray(x), params0), float)

        res = sciopt.least_squares(fun, x0, jac=jac, xtol=tol,
                                   max_nfev=maxiter, verbose=2 if disp else 0)
        self.problem.apply(res.x)
        return res


class _GlobalOptimizer(OptimizerGeneric):
    """Base for scipy global optimizers needing finite bounds."""

    def _finite_bounds(self):
        bounds = self._bounds()
        if bounds is None or any(b[0] is None or b[1] is None for b in bounds):
            raise ValueError(
                "Global optimizers require finite min_val/max_val bounds on "
                "every variable."
            )
        return bounds


class DualAnnealing(_GlobalOptimizer):
    def optimize(self, maxiter: int = 1000, disp: bool = False):
        from scipy import optimize as sciopt

        c = self.problem._compile()
        params0 = self.problem.optic.params
        self._undo.append(np.asarray(self.problem.x0(), float))

        def fun(x):
            return float(c["sum_squared"](jnp.asarray(x), params0))

        res = sciopt.dual_annealing(fun, self._finite_bounds(),
                                    maxiter=maxiter)
        self.problem.apply(res.x)
        return res


class DifferentialEvolution(_GlobalOptimizer):
    def optimize(self, maxiter: int = 1000, disp: bool = False,
                 workers: int = 1):
        from scipy import optimize as sciopt

        c = self.problem._compile()
        params0 = self.problem.optic.params
        self._undo.append(np.asarray(self.problem.x0(), float))

        def fun(x):
            return float(c["sum_squared"](jnp.asarray(x), params0))

        res = sciopt.differential_evolution(
            fun, self._finite_bounds(), maxiter=maxiter, disp=disp,
            workers=workers, polish=False,
        )
        self.problem.apply(res.x)
        return res


class BasinHopping(OptimizerGeneric):
    def optimize(self, niter: int = 100, disp: bool = False):
        from scipy import optimize as sciopt

        c = self.problem._compile()
        params0 = self.problem.optic.params
        x0 = np.asarray(self.problem.x0(), float)
        self._undo.append(x0)

        def fun(x):
            v, g = c["value_and_grad"](jnp.asarray(x), params0)
            return float(v), np.asarray(g, float)

        res = sciopt.basinhopping(
            fun, x0, niter=niter, disp=disp,
            minimizer_kwargs={"jac": True},
        )
        self.problem.apply(res.x)
        return res


class SHGO(_GlobalOptimizer):
    """Simplicial homology global optimization (reference
    `optimizer/scipy/shgo.py`)."""

    def optimize(self, n: int = 100, iters: int = 1, disp: bool = False):
        from scipy import optimize as sciopt

        c = self.problem._compile()
        params0 = self.problem.optic.params
        self._undo.append(np.asarray(self.problem.x0(), float))

        def fun(x):
            return float(c["sum_squared"](jnp.asarray(x), params0))

        res = sciopt.shgo(fun, self._finite_bounds(), n=n, iters=iters,
                          options={"disp": disp})
        self.problem.apply(res.x)
        return res


class OrthogonalDescent(OptimizerGeneric):
    """Cyclic coordinate descent with Brent line searches — derivative-free,
    one variable at a time (reference
    `optimizer/scipy/orthogonal_descent.py:21-105`)."""

    def optimize(self, max_iter: int = 100, tol: float = 1e-4,
                 disp: bool = False):
        from scipy.optimize import minimize_scalar

        c = self.problem._compile()
        params0 = self.problem.optic.params
        x = np.array(self.problem.x0(), float)  # own writable copy
        self._undo.append(x.copy())
        bounds = self._bounds() or [(None, None)] * len(x)

        def rss(xv):
            return float(np.sqrt(c["sum_squared"](jnp.asarray(xv), params0)))

        current = rss(x)
        for _ in range(max_iter):
            prev = current
            for i in range(len(x)):
                lo, hi = bounds[i]
                lo = -1e12 if lo is None else lo
                hi = 1e12 if hi is None else hi
                x_start, f_start = x[i], rss(x)

                def obj(v, i=i, lo=lo, hi=hi):
                    if v < lo or v > hi:
                        return 1e20
                    x[i] = v
                    try:
                        return rss(x)
                    finally:
                        x[i] = x_start

                step = max(abs(x_start) * 0.05, 0.1)
                res = minimize_scalar(obj, bracket=(x_start - step,
                                                    x_start + step),
                                      method="brent", tol=1e-5)
                if res.fun < f_start:
                    x[i] = float(res.x)
            current = rss(x)
            if disp:
                print(f"orthogonal descent: rss={current:.6g}")
            if abs(prev - current) / (prev + 1e-10) < tol:
                break
        self.problem.apply(x)
        return OptimizationResult(x=x, fun=current)


class _OptaxOptimizer:
    """On-device first-order loop: the whole (step, opt-state) update is one
    jitted graph; bounds are clamped post-step as the reference's torch
    optimizers do (`optimizer/torch/base.py`)."""

    def __init__(self, problem, lr: float = 1e-2):
        self.problem = problem
        self.lr = lr

    def _tx(self):
        raise NotImplementedError

    def optimize(self, n_steps: int = 100, disp: bool = False, callback=None,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False,
                 metrics: list | None = None):
        """Run the jitted first-order loop.

        checkpoint_dir/checkpoint_every/resume: orbax (x, opt_state, step)
        checkpointing for long runs (SURVEY §5 checkpoint/resume;
        `optiland_tpu.utils.checkpoint`). `metrics`: optional list that
        collects one dict per step with loss, grad-norm, step wall time and
        evals/s (SURVEY §5 metrics/observability).
        """
        import time

        import optax

        c = self.problem._compile()
        params0 = self.problem.optic.params
        tx = self._tx()

        lo = jnp.asarray([
            -jnp.inf if v.bounds[0] is None else float(v.scaler.scale(v.bounds[0]))
            for v in self.problem.variables
        ])
        hi = jnp.asarray([
            jnp.inf if v.bounds[1] is None else float(v.scaler.scale(v.bounds[1]))
            for v in self.problem.variables
        ])
        lo2 = jnp.minimum(lo, hi)
        hi2 = jnp.maximum(lo, hi)

        @jax.jit
        def step(x, opt_state):
            loss, grads = c["value_and_grad"](x, params0)
            updates, opt_state = tx.update(grads, opt_state, x)
            x = optax.apply_updates(x, updates)
            x = jnp.clip(x, lo2, hi2)
            gnorm = jnp.sqrt(sum(jnp.sum(g * g)
                                 for g in jax.tree_util.tree_leaves(grads)))
            return x, opt_state, loss, gnorm

        x = jnp.asarray(self.problem.x0())
        opt_state = tx.init(x)
        start = 0
        restored_losses = []
        if checkpoint_dir and resume:
            from optiland_tpu.utils.checkpoint import (
                checkpoint_step,
                latest_checkpoint,
                restore_checkpoint,
            )

            latest = latest_checkpoint(checkpoint_dir)
            if latest is not None:
                state = restore_checkpoint(latest)
                x = jnp.asarray(state["x"])
                # opt_state round-trips as flat leaves (orbax does not
                # preserve optax NamedTuple node types)
                opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(opt_state),
                    [jnp.asarray(leaf)
                     for leaf in state["opt_state_leaves"]])
                start = checkpoint_step(latest)
                restored_losses = [float(v) for v in
                                   np.asarray(state.get("losses", []))]

        losses = list(restored_losses)
        for i in range(start, n_steps):
            t0 = time.perf_counter()
            x, opt_state, loss, gnorm = step(x, opt_state)
            loss_f = float(loss)
            dt = time.perf_counter() - t0
            losses.append(loss_f)
            if metrics is not None:
                metrics.append({"step": i, "loss": loss_f,
                                "grad_norm": float(gnorm),
                                "step_time_s": dt,
                                "evals_per_s": 1.0 / max(dt, 1e-12)})
            if callback is not None:
                callback(i, loss_f)
            if checkpoint_dir and checkpoint_every \
                    and (i + 1) % checkpoint_every == 0:
                from optiland_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(checkpoint_dir, i + 1,
                                {"step": i + 1, "x": x,
                                 "losses": np.asarray(losses),
                                 "opt_state_leaves":
                                     jax.tree_util.tree_leaves(opt_state)})
            if disp and (i % max(1, n_steps // 10) == 0):
                print(f"step {i:5d}  loss {loss_f:.6e}")
        self.problem.apply(x)
        # a resume at step >= n_steps runs zero new steps; evaluate once so
        # fun/success are well-defined (ADVICE r3)
        if not losses:
            losses = [float(c["value_and_grad"](x, params0)[0])]
        return OptimizationResult(x=np.asarray(x), fun=losses[-1],
                                  loss_history=losses, nit=n_steps,
                                  success=bool(np.isfinite(losses[-1])))


class AdamOptimizer(_OptaxOptimizer):
    def _tx(self):
        import optax

        return optax.adam(self.lr)


class SGDOptimizer(_OptaxOptimizer):
    def __init__(self, problem, lr: float = 1e-3, momentum: float = 0.9):
        super().__init__(problem, lr)
        self.momentum = momentum

    def _tx(self):
        import optax

        return optax.sgd(self.lr, momentum=self.momentum)
