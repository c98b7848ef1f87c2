"""Shared Levenberg-Marquardt machinery: robust kernels, block linear
algebra, and a masked preconditioned conjugate-gradient solver.

Replaces `Thirdparty/g2o/g2o/core/{optimization_algorithm_levenberg.cpp,
robust_kernel_impl.cpp, block_solver.hpp}`: instead of a sparse
block-matrix with pointer bookkeeping, every solver in this package keeps
fixed-shape residual batches and solves its reduced system either densely
(small state) or with implicit matrix-free PCG (large state).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Chi2 gates at 95% for 2/3 DoF (ref Optimizer.cc chi2Mono / chi2Stereo).
CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """Huber IRLS weight on the *squared* error (g2o RobustKernelHuber).

    w = 1 if chi2 <= delta2 else delta/sqrt(chi2).
    """
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None]


def solve_block_diag(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve per-block H_i x_i = b_i for (N, k, k), (N, k)."""
    return jnp.linalg.solve(H, b[..., None])[..., 0]


class PCGResult(NamedTuple):
    x: jnp.ndarray
    residual_norm: jnp.ndarray


def pcg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    precond: Callable[[jnp.ndarray], jnp.ndarray],
    iters: int,
    tol: float = 1e-6,
) -> PCGResult:
    """Fixed-iteration preconditioned CG on an SPD operator.

    b may be any pytree-shaped array; matvec/precond operate on it whole.
    Runs `iters` steps with an early-out mask (steps become no-ops once
    converged) so the program shape is static.
    """

    def dot(u, v):
        return jnp.sum(u * v)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = dot(r0, z0)
    b_norm = jnp.sqrt(dot(b, b)) + 1e-30

    def body(_, state):
        x, r, p, rz = state
        done = jnp.sqrt(dot(r, r)) / b_norm < tol
        Ap = matvec(p)
        denom = dot(p, Ap)
        alpha = jnp.where(jnp.abs(denom) < 1e-30, 0.0, rz / denom)
        alpha = jnp.where(done, 0.0, alpha)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = jnp.where(jnp.abs(rz) < 1e-30, 0.0, rz_new / rz)
        p = jnp.where(done, p, z + beta * p)
        return (x, r, p, rz_new)

    x, r, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, p0, rz0))
    return PCGResult(x=x, residual_norm=jnp.sqrt(dot(r, r)) / b_norm)


class LMState(NamedTuple):
    """Generic LM loop state for solvers with accept/reject damping."""

    params: tuple  # solver-specific pytree
    lam: jnp.ndarray
    cost: jnp.ndarray


def lm_loop(
    init_params,
    cost_fn: Callable,
    step_fn: Callable,
    iters: int,
    lam0: float = 1e-4,
    lam_up: float = 4.0,
    lam_down: float = 0.5,
):
    """Run `iters` LM iterations.

    step_fn(params, lam) -> candidate params (a damped GN step).
    cost_fn(params) -> scalar robust cost.
    Rejected steps keep old params and raise lambda — expressed with
    jnp.where so the loop is a fixed-shape `fori_loop` (the reference's
    g2o LM does the same accept/reject dance in
    `optimization_algorithm_levenberg.cpp`).
    """
    init = LMState(
        params=init_params,
        lam=jnp.asarray(lam0, jnp.float32),
        cost=cost_fn(init_params),
    )

    def body(_, s: LMState) -> LMState:
        cand = step_fn(s.params, s.lam)
        new_cost = cost_fn(cand)
        accept = new_cost < s.cost
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(accept, new, old), cand, s.params
        )
        lam = jnp.where(accept, s.lam * lam_down, s.lam * lam_up)
        lam = jnp.clip(lam, 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, s.cost)
        return LMState(params=params, lam=lam, cost=cost)

    out = jax.lax.fori_loop(0, iters, body, init)
    return out.params, out.cost
