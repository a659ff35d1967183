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
    """Point-block Jacobi: diag_blocks (n_nodes, nf, nf) per-node blocks."""
    inv = jnp.linalg.inv(diag_blocks)
    nf = diag_blocks.shape[-1]

    def minv(x):
        xb = x.reshape(-1, nf)
        # background layout is field-blocked: reshape accordingly
        return jnp.einsum("nij,nj->ni", inv, xb).reshape(-1)

    return minv
