"""Double-float (two-f32) arithmetic for TPU hot paths.

XLA:TPU emulates f64 at ~0.5 G op/s (PERF.md) — ~3 orders below f32 VPU
throughput. Where ~47-bit mantissa accuracy suffices (stencil coefficients,
iterative-refinement residuals: the bench target is 1e-10 *relative*), we
represent values as unevaluated f32 pairs (hi, lo) with |lo| <= ulp(hi)/2
and compute with error-free transforms:

* two_sum / quick_two_sum: Knuth / Dekker exact addition;
* two_prod via Dekker 12-bit splitting (TPU f32 has no user-visible FMA);
* df_add / df_mul / df_fma composing them (~10-25 f32 ops each — still
  ~50-100x cheaper than emulated f64).

Error-free transforms rely on IEEE f32 semantics of +,-,*. XLA does not
reassociate float arithmetic at default settings; tests/test_df.py guards
this (if a compiler change ever breaks two_sum, those tests collapse to
f32 accuracy and fail loudly).

A df value is a plain (hi, lo) tuple of same-shape f32 arrays — pytree-
friendly, no wrapper class on the hot path.
"""
from __future__ import annotations

import jax.numpy as jnp

_SPLITTER = 4097.0  # 2^12 + 1 for f32 Dekker splitting


def two_sum(a, b):
    """s + e = a + b exactly (Knuth, 6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """s + e = a + b exactly, assuming |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLITTER * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e = a * b exactly (Dekker, ~17 flops)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_from_f64(x):
    """Split an f64 array into a df pair (exact to f32-pair precision)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def df_to_f64(d):
    hi, lo = d
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def df_zeros(shape, like=None):
    z = jnp.zeros(shape, jnp.float32)
    return z, z


def df_neg(a):
    return -a[0], -a[1]


def df_add(a, b):
    """df + df (Dekker/QD 'sloppy' two-pass addition, ~11 flops; relative
    error ~2^-47 — ample for 1e-10 refinement targets)."""
    s, e = two_sum(a[0], b[0])
    e = e + a[1] + b[1]
    return quick_two_sum(s, e)


def df_sub(a, b):
    return df_add(a, df_neg(b))


def df_add_f32(a, b):
    s, e = two_sum(a[0], b)
    e = e + a[1]
    return quick_two_sum(s, e)


def df_mul(a, b):
    """df * df (~25 flops)."""
    p, e = two_prod(a[0], b[0])
    e = e + a[0] * b[1] + a[1] * b[0]
    return quick_two_sum(p, e)


def df_mul_f32(a, b):
    """df * f32 (~22 flops)."""
    p, e = two_prod(a[0], b)
    e = e + a[1] * b
    return quick_two_sum(p, e)


def df_fma(acc, a, b):
    """acc + a*b, all df."""
    return df_add(acc, df_mul(a, b))


def df_div(a, b):
    """df / df (one Newton correction on the f32 quotient, ~50 flops)."""
    q0 = a[0] / b[0]
    r = df_sub(a, df_mul_f32(b, q0))
    q1 = (r[0] + r[1]) / b[0]
    return quick_two_sum(q0, q1)


def df_masked(a, mask):
    """Zero a df value where mask is False."""
    return a[0] * mask, a[1] * mask


def df_sum(a, axis):
    """Sum a df array along an axis via a pairwise (tree) compensated
    reduction: O(log n) df_adds in the graph instead of an O(n) sequential
    fold — same ~2^-47 per-level error model, hardware-parallel, and keeps
    jit graphs small when n is the binned slot depth L."""
    hi, lo = a
    hi = jnp.moveaxis(hi, axis, 0)
    lo = jnp.moveaxis(lo, axis, 0)
    n = hi.shape[0]
    while n > 1:
        m = n // 2
        acc = df_add((hi[:m], lo[:m]), (hi[m:2 * m], lo[m:2 * m]))
        if n % 2:
            head = df_add((acc[0][:1], acc[1][:1]), (hi[-1:], lo[-1:]))
            acc = (jnp.concatenate([head[0], acc[0][1:]]),
                   jnp.concatenate([head[1], acc[1][1:]]))
        hi, lo = acc
        n = m
    return hi[0], lo[0]
