"""Stencil-form background operators: the TPU speed-of-light product path.

XLA:TPU serializes elementwise gathers/scatters, so the general matrix-free
path (gather -> block matvec -> transpose-gather) runs ~1000x below memory
bandwidth. But the reference's background spaces are *structured lattices*
(MORIS/XTK grids, our generated grids): on a lattice, the projected operator
A_b = Mᵀ A_f M has a fixed sparsity stencil — every row couples only dofs
within a (2r+1)×(2r+1) offset window. Then

    y[i,j] = Σ_{|di|,|dj| <= r}  C[di,dj][i,j] * x[i+di, j+dj]

which is 25 dense shifted multiply-adds over the whole grid — pure VPU
streaming at HBM bandwidth, no indexed memory access at all.

The variable coefficients C are extracted from ANY abstract operator by
lattice probing (matrix probing / graph coloring): apply the slow matvec to
(2r+1)² indicator combs; because same-color lattice points have disjoint
stencil neighborhoods, one application recovers one diagonal band of A_b per
color. 25 slow applications at setup buy unlimited fast applications.

This turns the Jacobi-PCG bench loop into the same compute pattern as a
5-point-Laplacian multigrid smoother — the operator the TPU was made for.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class StencilOperator2D:
    """A_b in variable-coefficient stencil form on an (nx+1, ny+1) lattice.

    Node id layout must match mesh.generators.rectangle_mesh:
    id = i * (ny + 1) + j.
    """

    def __init__(self, coeffs: jnp.ndarray, shape: tuple[int, int], radius: int):
        self.coeffs = coeffs          # ((2r+1)^2, nx1, ny1)
        self.shape = tuple(shape)
        self.radius = radius
        self.n = shape[0] * shape[1]

    def tree_flatten(self):
        return (self.coeffs,), (self.shape, self.radius)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape, radius = aux
        return cls(leaves[0], shape, radius)

    def astype(self, dtype) -> "StencilOperator2D":
        return StencilOperator2D(
            self.coeffs.astype(dtype), self.shape, self.radius
        )

    @staticmethod
    def probe_multi(matvec_multi, shape: tuple[int, int], radius: int = 2,
                    dtype=jnp.float32) -> "StencilOperator2D":
        """Like probe(), but all (2r+1)² indicator combs go through ONE
        multi-RHS operator application — amortizing the slow general path's
        per-index gather latency across the probe columns.

        The coefficient distribution Y -> C exploits that the color seen at
        offset k from a point depends only on the point's (i mod m, j mod m)
        phase: it reduces to m² x m² *static* strided-slice copies — no
        masked full-grid ops, trivial to compile and execute.

        (No boundary masking is needed: for probe points that would fall
        outside the grid, every in-grid point of that color is farther than
        the stencil radius, so the probed value is exactly 0 already.)
        """
        nx1, ny1 = shape
        r = radius
        m = 2 * r + 1
        I, J = jnp.meshgrid(jnp.arange(nx1), jnp.arange(ny1), indexing="ij")
        X = jnp.stack(
            [
                ((I % m == a) & (J % m == b)).astype(dtype).reshape(-1)
                for a in range(m)
                for b in range(m)
            ],
            axis=1,
        )
        Y = matvec_multi(X)                                     # (n, m²)

        # pad to phase-aligned blocks and slice per (phase, offset)
        nxp = -(-nx1 // m) * m
        nyp = -(-ny1 // m) * m
        Y3 = jnp.pad(
            Y.reshape(nx1, ny1, m * m), ((0, nxp - nx1), (0, nyp - ny1), (0, 0))
        ).reshape(nxp // m, m, nyp // m, m, m * m)
        Cs = []
        for oi in range(-r, r + 1):
            for oj in range(-r, r + 1):
                rows = []
                for p in range(m):
                    cols = []
                    for q in range(m):
                        c = ((p + oi) % m) * m + ((q + oj) % m)
                        cols.append(Y3[:, p, :, q, c])   # (nxp/m, nyp/m)
                    rows.append(jnp.stack(cols, axis=-1))  # (.., nyp/m, m)
                blk = jnp.stack(rows, axis=1)            # (nxp/m, m, nyp/m, m)
                Cs.append(blk.reshape(nxp, nyp))
        C = jnp.stack(Cs)
        return StencilOperator2D(C[:, :nx1, :ny1], shape, r)

    @staticmethod
    def probe(matvec, shape: tuple[int, int], radius: int = 2,
              dtype=jnp.float32) -> "StencilOperator2D":
        """Extract stencil coefficients from an abstract matvec by coloring.

        matvec: the slow/general A_b application on flat vectors of length
        shape[0]*shape[1].
        """
        nx1, ny1 = shape
        r = radius
        m = 2 * r + 1
        ii = jnp.arange(nx1)
        jj = jnp.arange(ny1)
        I, J = jnp.meshgrid(ii, jj, indexing="ij")

        coeffs = []
        offsets = []
        for a in range(m):
            for b in range(m):
                comb = ((I % m == a) & (J % m == b)).astype(dtype)
                y = matvec(comb.reshape(-1)).reshape(nx1, ny1)
                # the probe point p seen from q=(i,j): p ≡ (a,b) (mod m),
                # within radius r — unique. offset d = p - q in [-r, r].
                di = (a - I) % m
                di = jnp.where(di > r, di - m, di)
                dj = (b - J) % m
                dj = jnp.where(dj > r, dj - m, dj)
                coeffs.append((y, di, dj))
        # regroup by offset: C[d][q] = y_color(q) where color matches d at q
        C = jnp.zeros((m * m, nx1, ny1), dtype)
        for y, di, dj in coeffs:
            for oi in range(-r, r + 1):
                for oj in range(-r, r + 1):
                    sel = (di == oi) & (dj == oj)
                    k = (oi + r) * m + (oj + r)
                    C = C.at[k].add(jnp.where(sel, y, 0.0))
        # zero out-of-grid offsets (probe points beyond the boundary)
        for oi in range(-r, r + 1):
            for oj in range(-r, r + 1):
                k = (oi + r) * m + (oj + r)
                valid = (
                    (I + oi >= 0) & (I + oi < nx1)
                    & (J + oj >= 0) & (J + oj < ny1)
                )
                C = C.at[k].multiply(valid.astype(dtype))
        return StencilOperator2D(C, shape, r)

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A_b x as 25 shifted dense multiply-adds."""
        nx1, ny1 = self.shape
        r = self.radius
        m = 2 * r + 1
        x2 = x.reshape(nx1, ny1)
        xp = jnp.pad(x2, ((r, r), (r, r)))
        y = jnp.zeros_like(x2)
        for oi in range(-r, r + 1):
            for oj in range(-r, r + 1):
                k = (oi + r) * m + (oj + r)
                shifted = jax.lax.dynamic_slice(
                    xp, (oi + r, oj + r), (nx1, ny1)
                )
                y = y + self.coeffs[k] * shifted
        return y.reshape(-1)

    def diag(self) -> jnp.ndarray:
        r = self.radius
        m = 2 * r + 1
        k0 = r * m + r
        return self.coeffs[k0].reshape(-1)

    def verify(self, matvec, seed: int = 0, n_checks: int = 2) -> float:
        """Max relative error of the stencil form vs the abstract operator."""
        rng = np.random.default_rng(seed)
        worst = 0.0
        for _ in range(n_checks):
            x = jnp.asarray(
                rng.standard_normal(self.n).astype(self.coeffs.dtype)
            )
            y_ref = matvec(x)
            y = self.mv(x)
            num = float(jnp.linalg.norm(y - y_ref))
            den = float(jnp.linalg.norm(y_ref)) or 1.0
            worst = max(worst, num / den)
        return worst
