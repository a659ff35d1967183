"""Condition-number estimation.

Replaces the reference's GMRES singular-value probe
(estimateConditionNumber, common.py:483-507; PETSc setComputeSingularValues)
with Golub-Kahan Lanczos bidiagonalization using the operator and its
transpose — the same quantity (extreme singular values of A), computed with
device matvecs and a small host-side bidiagonal SVD.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def estimate_condition_number(A, iters: int = 100, seed: int = 0):
    """Returns (sigma_max, sigma_min) estimates of the background operator."""
    n = A.n
    rng = np.random.default_rng(seed)
    k = min(iters, n)
    U = np.zeros((k + 1, n))
    V = np.zeros((k + 1, n))
    alphas = np.zeros(k)
    betas = np.zeros(k)

    u = rng.standard_normal(n)
    u /= np.linalg.norm(u)
    U[0] = u
    v = np.zeros(n)
    beta = 0.0
    actual = k
    for j in range(k):
        v_new = np.asarray(A.mv_t(jnp.asarray(U[j]))) - beta * v
        # full reorthogonalization (small k, robustness over speed)
        v_new -= V[: j + 1].T @ (V[: j + 1] @ v_new)
        alpha = np.linalg.norm(v_new)
        if alpha < 1e-14:
            actual = j
            break
        v = v_new / alpha
        V[j] = v
        u_new = np.asarray(A.mv(jnp.asarray(v))) - alpha * U[j]
        u_new -= U[: j + 1].T @ (U[: j + 1] @ u_new)
        beta = np.linalg.norm(u_new)
        alphas[j] = alpha
        betas[j] = beta
        if beta < 1e-14:
            actual = j + 1
            break
        U[j + 1] = u_new / beta

    if actual == 0:
        return 0.0, 0.0
    B = np.zeros((actual + 1, actual))
    for j in range(actual):
        B[j, j] = alphas[j]
        B[j + 1, j] = betas[j]
    s = np.linalg.svd(B, compute_uv=False)
    s = s[s > 0]
    return float(s.max()), float(s.min())
