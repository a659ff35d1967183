"""Device-friendly preconditioners.

The reference's PC menu (common.py:568-616) maps as follows (SURVEY.md §2.3 N6):
  'jacobi'      -> jacobi()          (exact parity)
  'bjacobi'     -> block_jacobi()    (field-coupled point-block Jacobi)
  'ASM'/'ICC'/'ILU'/'ILUT' (hypre)   -> no TPU analog (sequential triangular
      solves); documented substitution is jacobi/block-jacobi + BFR trimming,
      or the host 'direct' path for ill-conditioned systems.
"""
from __future__ import annotations

import jax.numpy as jnp


def jacobi(diag: jnp.ndarray, guard: float = 0.0):
    """PCJACOBI. Zero diagonal entries (unsupported background basis functions,
    common.py:207-233) are replaced by 1 so they act as identity rows."""
    safe = jnp.where(jnp.abs(diag) > guard, diag, 1.0)
    inv = 1.0 / safe

    def minv(x):
        return inv * x

    return minv


def block_jacobi(diag_blocks: jnp.ndarray):
    """Point-block Jacobi (PCBJACOBI role): diag_blocks (m, nf, nf) per-node
    field-coupling blocks of the background operator.

    Background vectors are FIELD-BLOCKED (dof = node + field*m, the
    reference's layout — common.py:703), so a length-nf*m vector reshapes to
    (nf, m), not (m, nf).

    Unsupported background nodes (zero rows — basis functions with no active
    foreground support, common.py:207-233) make their block singular; those
    rows/columns fall back to the jacobi convention (identity action) by
    patching zero diagonal entries to 1 before inversion, and any block the
    inverse still fails on (non-finite) degrades to its diagonal inverse.
    """
    nf = diag_blocks.shape[-1]
    d = jnp.einsum("nii->ni", diag_blocks)                 # (m, nf)
    safe_d = jnp.where(jnp.abs(d) > 0, d, 1.0)
    eye = jnp.eye(nf, dtype=diag_blocks.dtype)
    patched = diag_blocks.at[
        :, jnp.arange(nf), jnp.arange(nf)
    ].set(safe_d)
    inv = jnp.linalg.inv(patched)
    diag_inv = eye * (1.0 / safe_d)[:, :, None]
    ok = jnp.isfinite(inv).all(axis=(1, 2), keepdims=True)
    inv = jnp.where(ok, jnp.where(jnp.isfinite(inv), inv, 0.0), diag_inv)

    def minv(x):
        xb = x.reshape(nf, -1)                             # [field, node]
        return jnp.einsum("nab,bn->an", inv, xb).reshape(-1)

    return minv
