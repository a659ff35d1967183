"""Geometric multigrid preconditioning on stencil-form background operators.

The reference's strongest preconditioners (MUMPS LU, hypre ILU — SURVEY.md
§2.3 N5/N6) are sequential-factorization methods with no TPU analog. The
TPU-native equivalent for lattice backgrounds is geometric multigrid over the
probed stencil operators:

* transfers are 3x3 full-weighting / bilinear conv kernels applied with
  strided (restriction) and dilated (prolongation) convolutions — MXU/VPU
  dense ops, P = 4 Rᵀ so the V-cycle is symmetric;
* coarse operators are Galerkin products R A P, extracted *again by stencil
  probing* of the composed operator (ops/stencil.py) — each level's operator
  stays a 5x5 variable-coefficient stencil;
* smoothing is weighted Jacobi (fixed sweep counts -> a linear, symmetric
  preconditioner, valid inside CG); the coarsest level is handled by a fixed
  number of Jacobi sweeps.

Zero rows (background dofs with no foreground support — the BFR situation,
common.py:261-332) get unit diagonal guards; their components stay zero
through the whole cycle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from iifea_tpu.ops.stencil import StencilOperator2D

_KERNEL = jnp.array(
    [[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]]
)


def _restrict(x2: jnp.ndarray) -> jnp.ndarray:
    """Full-weighting: y[i,j] = (1/4) Σ k[a,b] x[2i+a-1, 2j+b-1]."""
    k = (_KERNEL / 4.0).astype(x2.dtype)[None, None]
    x4 = x2[None, None]
    y = jax.lax.conv_general_dilated(
        x4, k, window_strides=(2, 2), padding=((1, 1), (1, 1))
    )
    return y[0, 0]


def _prolong(xc2: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation (P = 4 Rᵀ): dilated convolution."""
    k = _KERNEL.astype(xc2.dtype)[None, None]
    x4 = xc2[None, None]
    y = jax.lax.conv_general_dilated(
        x4, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2),
    )
    return y[0, 0]


@jax.jit
def _coarsen(fine: "StencilOperator2D") -> "StencilOperator2D":
    """Galerkin coarse operator R A P, re-probed into stencil form.

    The (2r+1)² probe columns go through ONE vmapped prolong->A->restrict
    batch (the stencil apply and transfer convolutions batch cleanly on the
    VPU) instead of a sequential per-column loop."""
    cshape = tuple((s - 1) // 2 + 1 for s in fine.shape)

    def rap_one(xc):
        xf = _prolong(xc.reshape(cshape))
        yf = fine.mv_ref(xf.reshape(-1)).reshape(fine.shape)
        return _restrict(yf).reshape(-1)

    return StencilOperator2D.probe_multi(
        jax.vmap(rap_one), cshape, radius=fine.radius, dtype=fine.dtype
    )


@jax.jit
def _invd_plane(S: "StencilOperator2D") -> jnp.ndarray:
    """Tile-padded 1/diag plane (loop-invariant smoother operand)."""
    d = S.diag()
    return S.pad_plane(1.0 / jnp.where(jnp.abs(d) > 0, d, 1.0))


@jax.tree_util.register_pytree_node_class
class StencilMultigrid:
    """Symmetric V-cycle preconditioner for a StencilOperator2D.

    Requires the fine lattice to be (2^k m + 1)² shaped; coarsening stops
    when a side would drop below ``min_size``. Registered as a pytree so the
    (setup-heavy) hierarchy can be built in one jit and reused across solves.
    """

    def tree_flatten(self):
        return (self.levels, self.inv_diags), (
            self.nu_pre, self.nu_post, self.omega, self.coarse_sweeps,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.levels, obj.inv_diags = children
        obj.nu_pre, obj.nu_post, obj.omega, obj.coarse_sweeps = aux
        return obj

    def __init__(
        self,
        S: StencilOperator2D,
        nu_pre: int = 2,
        nu_post: int = 2,
        omega: float = 0.67,
        coarse_sweeps: int = 60,
        min_size: int = 9,
    ):
        self.nu_pre, self.nu_post = nu_pre, nu_post
        self.omega = omega
        self.coarse_sweeps = coarse_sweeps
        # each coarsening level is its own jitted graph (keyed on the level
        # shape): one monolithic hierarchy-build graph overflows the remote
        # TPU compile helper at bench scale
        self.levels = [S]
        while all((s - 1) % 2 == 0 and s > min_size for s in self.levels[-1].shape):
            self.levels.append(_coarsen(self.levels[-1]))
        self.inv_diags = [_invd_plane(S_l) for S_l in self.levels]

    # -- cycle ------------------------------------------------------------------

    def _smooth(self, lvl: int, x, b, sweeps: int):
        S = self.levels[lvl]
        invd2 = self.inv_diags[lvl]
        b2 = S.pad_plane(b)      # pad once; invariant across sweeps
        om = self.omega

        def body(_, x):
            # fused stencil-apply + Jacobi update (Pallas on TPU)
            return S.jacobi_smooth(invd2, b2, x, om)

        return jax.lax.fori_loop(0, sweeps, body, x)

    def _vcycle(self, lvl: int, b):
        S = self.levels[lvl]
        if lvl == len(self.levels) - 1:
            return self._smooth(lvl, jnp.zeros_like(b), b, self.coarse_sweeps)
        x = self._smooth(lvl, jnp.zeros_like(b), b, self.nu_pre)
        r = b - S.mv(x)
        rc = _restrict(r.reshape(S.shape)).reshape(-1)
        xc = self._vcycle(lvl + 1, rc)
        x = x + _prolong(
            xc.reshape(self.levels[lvl + 1].shape)
        ).reshape(-1)
        return self._smooth(lvl, x, b, self.nu_post)

    def minv(self, r):
        return self._vcycle(0, r)
