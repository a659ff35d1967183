"""Gather-free lattice-binned Galerkin probe (the projection fast path).

The general stencil probe (StencilOperator2D.probe_multi over
BackgroundOperator.mv_multi) is XLA-gather-bound: every probe application
pays M-gathers, element-dof gathers, the assembly transpose-gather, and the
Mᵀ transpose-gather at ~34M indices/s — ~2.7 s of the 1M-dof bench.

This module removes every runtime gather from the probe for structured
lattice backgrounds (the reference's MORIS/XTK grids and our generators,
SURVEY.md §2.3 N8). At setup each foreground element is *binned* by a base
background cell — chosen as the min lattice corner over its extraction
targets. Because element diameters are below the background spacing (the
radius-2 stencil premise), every target of an element then sits at a static
offset δ ∈ {0..2}² from its base. All index structure becomes static
per-(slot, cell) tables:

  val_b  (ne, km, L, nc) f32/f64  extraction weight of contribution slot
  kappa  (ne, km, L, nc) int8     offset class 3·δi + δj  (0..8)
  phase  (ne, km, L, nc) int8     probe color (i mod 5)·5 + (j mod 5)
  perm   (L, nc)         int32    element id + 1 (0 = padding)

and the device-side probe is pure elementwise masked multiply-adds over
dense per-cell planes plus static shift-accumulation onto the lattice — VPU
streaming at HBM bandwidth. The only runtime indexed access is the single
(ne,ne,1)-slice gather binning the element Jacobian blocks.

The same tables serve dense (full-lattice) and compact (occupied-cell-list)
layouts; sparse-touch terms (interface facet integrals) use compact binning
with 9 unique-index scatters at the end.

Replaces the probe's use of the general path; the projected operator it
feeds (ops/stencil.py) and its consumers (multigrid, Krylov) are unchanged.
Reference role: the PtAP of la_utils.py:165-182 on lattice backgrounds.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class LatticeBinError(ValueError):
    """Raised when a term cannot be lattice-binned (spilled elements)."""


@jax.tree_util.register_pytree_node_class
class LatticeBinnedTerm2D:
    """One form term's binned probe tables on an (nx1, ny1) lattice.

    Built on host from the term's flattened element dofs and the extraction
    operator; ``probe_y(K)`` then computes this term's contribution to
    Y[c] = (Mᵀ A_term M) x_c for all (2r+1)² probe combs x_c without gathers.
    """

    def __init__(self, val_b, kappa, phase, perm, shape, meta=None,
                 cells=None):
        self.val_b = val_b          # (ne, km, L, nc)
        self.kappa = kappa          # (ne, km, L, nc) int8
        self.phase = phase          # (ne, km, L, nc) int8
        self.perm = perm            # (L, nc) int32, elem id + 1
        self.cells = cells          # None (dense) or (nc,) int32 cell ids
        self.shape = tuple(shape)
        self.meta = meta

    def tree_flatten(self):
        leaves = (self.val_b, self.kappa, self.phase, self.perm, self.cells)
        return leaves, (self.shape, self.meta)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        val_b, kappa, phase, perm, cells = leaves
        shape, meta = aux
        return cls(val_b, kappa, phase, perm, shape, meta, cells)

    # -- host construction ----------------------------------------------------

    @staticmethod
    def build(flat_eldofs: np.ndarray, M, shape, radius: int = 2,
              dtype=np.float32, compact: bool | None = None
              ) -> "LatticeBinnedTerm2D":
        """flat_eldofs: (nE, ne) foreground dof ids of the term's elements;
        M: ExtractionOperator (scalar field); shape: (nx1, ny1) lattice.

        compact: bin only occupied cells (auto when < 1/4 of cells touched).
        Raises LatticeBinError if any element's targets exceed the {0..2}²
        offset window (callers fall back to the general probe).
        """
        if radius != 2:
            raise LatticeBinError("lattice binning implemented for radius 2")
        nx1, ny1 = shape
        if M.n_bg_dofs != nx1 * ny1:
            raise LatticeBinError("extraction is not scalar on this lattice")
        eldofs = np.asarray(flat_eldofs, dtype=np.int64)   # (nE, ne)
        nE, ne = eldofs.shape
        idx = M.idx_np
        val = M.val_np
        km = idx.shape[1]
        tidx = idx[eldofs]                                 # (nE, ne, km)
        tval = val[eldofs].astype(dtype)
        valid = tval != 0.0
        ti = tidx // ny1
        tj = tidx - ti * ny1
        big = np.int64(1) << 40
        bi = np.where(valid, ti, big).min(axis=(1, 2))
        bj = np.where(valid, tj, big).min(axis=(1, 2))
        has = valid.any(axis=(1, 2))
        bi = np.clip(bi, 0, max(nx1 - 3, 0))
        bj = np.clip(bj, 0, max(ny1 - 3, 0))
        di = ti - bi[:, None, None]
        dj = tj - bj[:, None, None]
        in_win = ((di >= 0) & (di <= 2) & (dj >= 0) & (dj <= 2)) | ~valid
        spilled = has & ~in_win.all(axis=(1, 2))
        if spilled.any():
            raise LatticeBinError(
                f"{int(spilled.sum())} elements exceed the lattice stencil "
                "window (foreground elements wider than the background "
                "spacing); use the general probe"
            )
        use = np.flatnonzero(has)
        ncx, ncy = nx1 - 2, ny1 - 2
        cell = (bi[use] * ncy + bj[use]).astype(np.int64)

        if compact is None:
            compact = np.unique(cell).size < (ncx * ncy) // 4
        if compact:
            cells_occ, cell_c = np.unique(cell, return_inverse=True)
            nc = cells_occ.size
            cell = cell_c
            cells_arr = cells_occ.astype(np.int32)
        else:
            nc = ncx * ncy
            cells_arr = None
        nc = max(nc, 1)

        counts = np.bincount(cell, minlength=nc)
        L = max(int(counts.max()) if counts.size else 0, 1)
        order = np.argsort(cell, kind="stable")
        cell_s = cell[order]
        starts = np.zeros(nc, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        slot = np.arange(cell.size, dtype=np.int64) - starts[cell_s]

        perm = np.zeros((L, nc), dtype=np.int32)
        perm[slot, cell_s] = (use[order] + 1).astype(np.int32)

        val_t = np.zeros((ne, km, L, nc), dtype=dtype)
        kap_t = np.zeros((ne, km, L, nc), dtype=np.int8)
        pha_t = np.zeros((ne, km, L, nc), dtype=np.int8)
        src = use[order]
        # masked-out (invalid) entries keep val 0 -> contribute nothing
        val_t[:, :, slot, cell_s] = np.moveaxis(
            np.where(valid[src], tval[src], 0.0), 0, -1
        )
        kap_t[:, :, slot, cell_s] = np.moveaxis(
            (di[src] * 3 + dj[src]).astype(np.int8), 0, -1
        )
        pha_t[:, :, slot, cell_s] = np.moveaxis(
            ((ti[src] % 5) * 5 + tj[src] % 5).astype(np.int8), 0, -1
        )
        return LatticeBinnedTerm2D(
            jnp.asarray(val_t), jnp.asarray(kap_t), jnp.asarray(pha_t),
            jnp.asarray(perm), shape,
            meta=(ne, km, L, nc),
            cells=jnp.asarray(cells_arr) if cells_arr is not None else None,
        )

    # -- device probe ---------------------------------------------------------

    def probe_y(self, K: jnp.ndarray) -> jnp.ndarray:
        """This term's Y (25, nx1*ny1): projected operator applied to all 25
        phase-comb probe vectors. K: (ne, ne, nE) element Jacobian blocks.
        """
        ne, km, L, nc = self.meta
        nx1, ny1 = self.shape
        ncx, ncy = nx1 - 2, ny1 - 2
        dt = self.val_b.dtype
        Kpad = jnp.concatenate(
            [jnp.zeros((ne, ne, 1), K.dtype), K.astype(dt)], axis=-1
        )
        Kb = Kpad[:, :, self.perm]                 # (ne, ne, L, nc)

        val_b, kappa, phase = self.val_b, self.kappa, self.phase

        def one_color(c):
            c = c.astype(jnp.int8) if hasattr(c, "astype") else c
            # xe[b] = (M x_c) at local dof b — phase-indicator contraction
            xe = [
                sum(
                    val_b[b, kb] * (phase[b, kb] == c).astype(dt)
                    for kb in range(km)
                )
                for b in range(ne)
            ]                                       # ne x (L, nc)
            # ye[a] = Σ_b K[a,b] xe[b]  (unrolled FMAs, no big intermediates)
            ye = [
                sum(Kb[a, b] * xe[b] for b in range(ne)) for a in range(ne)
            ]
            # acc[d] = Σ_{a,ka,l} val·ye·[κ==d]
            acc = [jnp.zeros((nc,), dt) for _ in range(9)]
            for a in range(ne):
                for ka in range(km):
                    V = val_b[a, ka] * ye[a]        # (L, nc)
                    kap = kappa[a, ka]
                    for d in range(9):
                        acc[d] = acc[d] + (
                            V * (kap == d).astype(dt)
                        ).sum(axis=0)
            if self.cells is None:
                Y = jnp.zeros((nx1, ny1), dt)
                for d in range(9):
                    di, dj = d // 3, d % 3
                    Y = jax.lax.dynamic_update_slice(
                        Y,
                        jax.lax.dynamic_slice(
                            Y, (di, dj), (ncx, ncy)
                        ) + acc[d].reshape(ncx, ncy),
                        (di, dj),
                    )
                return Y.reshape(-1)
            Y = jnp.zeros(nx1 * ny1, dt)
            base_i = self.cells // ncy
            base_j = self.cells - base_i * ncy
            for d in range(9):
                di, dj = d // 3, d % 3
                rows = (base_i + di) * ny1 + base_j + dj
                Y = Y.at[rows].add(acc[d])   # unique within one offset class
            return Y

        return jax.lax.map(one_color, jnp.arange(25, dtype=jnp.int8))


def build_binned_projection(form, M, shape, radius: int = 2,
                            dtype=np.float32) -> list[LatticeBinnedTerm2D]:
    """Binned probe tables for every term of a form (host, setup-time).

    Terms touching few cells (facet integrals) get compact binning. Raises
    LatticeBinError if any term cannot be binned — callers fall back to the
    general StencilOperator2D.probe_multi path.
    """
    if form.n_fields != 1:
        raise LatticeBinError("lattice binning covers scalar fields")
    reducers = []
    for dom, _ in form.terms:
        fl = getattr(dom, "flat_eldofs_np", None)
        if fl is None:
            fl = np.asarray(dom.eldofsT).T
        reducers.append(
            LatticeBinnedTerm2D.build(fl, M, shape, radius, dtype=dtype)
        )
    return reducers


def probe_y_binned(reducers, blocks) -> jnp.ndarray:
    """Y (25, n) = A_b applied to the 25 probe combs, summed over terms."""
    Y = reducers[0].probe_y(blocks[0])
    for red, K in zip(reducers[1:], blocks[1:]):
        Y = Y + red.probe_y(K)
    return Y
