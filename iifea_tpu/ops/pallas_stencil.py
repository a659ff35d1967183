"""Pallas TPU kernels for variable-coefficient stencil operators.

The MG-PCG hot loop (bench.py, solvers/krylov.py) is dominated by the
(2r+1)² -tap stencil apply and the weighted-Jacobi smoother on (nx1, ny1)
lattices (ops/stencil.py). Per application the compulsory HBM traffic is the
(2r+1)² coefficient planes + the operand plane; these kernels approach that
bound by

* streaming the (pre-tile-padded) coefficient planes through VMEM in
  (TM, NYP) row-blocks (auto double-buffered by the Pallas pipeline — they
  are the dominant traffic, and are padded once at operator construction,
  never per apply);
* DMA-ing each program's x slab (TM + 2r halo rows) from HBM **one program
  ahead** (manual double buffering), so x is read ~once instead of 25
  shifted times — the XLA fusion of the same stencil re-reads each shifted
  window from HBM, ~2x the compulsory traffic;
* fusing the Jacobi update x + ω·invd·(b − A x) into the same pass
  (``jacobi_smooth``), saving two extra plane round-trips per smoothing
  sweep vs mv-then-axpy. b and 1/diag enter as pre-padded planes
  (loop-invariant across sweeps).

All DMA slabs are (8, 128)-tile aligned (Mosaic rejects unaligned memref
slices), and index maps derive their constants from the program index so
every component shares its i32 dtype (with jax_enable_x64, literal 0s would
become i64 and Mosaic rejects the mixed-type return).

f32 only (the f32 MG-PCG inner loop is where ~all bandwidth goes); the f64
iterative-refinement residual stays on the jnp fallback path. Outside TPU the
public entry points fall back to the pure-jnp implementation automatically
(tests exercise the kernels via ``interpret=True``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_TM = 16         # rows per program (multiple of the 8-row f32 sublane tile)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def padded_shape(shape: tuple[int, int]) -> tuple[int, int]:
    """Tile-padded plane shape: rows to the row-block, cols to the lane."""
    return _ceil_to(shape[0], _TM), _ceil_to(shape[1], _LANE)


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _slab_rows(tm: int, r: int) -> int:
    # DMA slab height: tm + 2r halo rows, rounded to the sublane tile so the
    # HBM->VMEM copy is tile-aligned
    return _ceil_to(tm + 2 * r, 8)


# -- kernels -------------------------------------------------------------------


def _taps(c_ref, xs, r: int, tm: int, nyp: int):
    m = 2 * r + 1
    acc = c_ref[0] * xs[0:tm, 0:nyp]
    for k in range(1, m * m):
        oi, oj = divmod(k, m)
        acc += c_ref[k] * xs[oi:oi + tm, oj:oj + nyp]
    return acc


def _x_pipeline(xp_hbm, xs2, sem2, r: int, tm: int):
    """Double-buffered x-slab fetch: program i waits on its own slab and
    prefetches program i+1's. Scratch persists across the sequential grid."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = _slab_rows(tm, r)
    two = jnp.asarray(2, i.dtype)
    one = jnp.asarray(1, i.dtype)
    slot = jax.lax.rem(i, two)
    nxt = jax.lax.rem(i + one, two)

    def dma(s, j):
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(j * tm, rows), :], xs2.at[s], sem2.at[s]
        )

    @pl.when(i == 0)
    def _():
        dma(slot, i).start()

    @pl.when(i + 1 < n)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()
    return slot


def _mv_kernel(xp_hbm, c_ref, y_ref, xs2, sem2, *, r: int, tm: int, nyp: int):
    slot = _x_pipeline(xp_hbm, xs2, sem2, r, tm)
    y_ref[:] = _taps(c_ref, xs2.at[slot], r, tm, nyp)


def _smooth_kernel(xp_hbm, c_ref, b_ref, invd_ref, om_ref, y_ref, xs2, sem2,
                   *, r: int, tm: int, nyp: int):
    slot = _x_pipeline(xp_hbm, xs2, sem2, r, tm)
    xs = xs2.at[slot]
    acc = _taps(c_ref, xs, r, tm, nyp)
    xc = xs[r:r + tm, r:r + nyp]
    y_ref[:] = xc + om_ref[0, 0] * invd_ref[:] * (b_ref[:] - acc)


# -- host-side wrappers ----------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("shape", "radius", "interpret")
)
def stencil_mv(cp, x, shape, radius, interpret=False):
    """y = A x: cp ((2r+1)², nxp, nyp) tile-padded coefficients, x (n,)."""
    y2 = _apply(cp, x, None, None, None, shape, radius, interpret)
    return y2.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("shape", "radius", "interpret")
)
def jacobi_smooth(cp, invd2, b2, x, omega, shape, radius, interpret=False):
    """One weighted-Jacobi sweep x + ω·invd·(b − A x), fused in one pass.

    ``invd2``/``b2`` are (nxp, nyp) tile-padded planes.
    """
    y2 = _apply(cp, x, invd2, b2, omega, shape, radius, interpret)
    return y2.reshape(-1)


def _apply(cp, x, invd2, b2, omega, shape, radius, interpret):
    nx1, ny1 = shape
    r = radius
    m = 2 * r + 1
    tm = _TM
    nxp, nyp = padded_shape(shape)
    dt = cp.dtype

    # tile-aligned halo frame: x sits at offset (r, r); rows cover the last
    # program's full DMA slab, cols the lane-rounded halo width
    rows_slab = _slab_rows(tm, r)
    xrows = nxp - tm + rows_slab
    xcols = _ceil_to(nyp + 2 * r, _LANE)
    x2 = x.reshape(nx1, ny1).astype(dt)
    xp = jnp.pad(x2, ((r, xrows - nx1 - r), (r, xcols - ny1 - r)))
    grid = (nxp // tm,)

    def _row_map(i):
        return (i, jnp.zeros_like(i))

    def _coef_map(i):
        z = jnp.zeros_like(i)
        return (z, i, z)

    smooth = invd2 is not None
    if smooth:
        kern = functools.partial(_smooth_kernel, r=r, tm=tm, nyp=nyp)
        om = jnp.asarray(omega, dt).reshape(1, 1)

        def _zero_map(i):
            z = jnp.zeros_like(i)
            return (z, z)

        extra_in = [
            pl.BlockSpec((tm, nyp), _row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, nyp), _row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), _zero_map, memory_space=pltpu.SMEM),
        ]
        args = (xp, cp, b2.astype(dt), invd2.astype(dt), om)
    else:
        kern = functools.partial(_mv_kernel, r=r, tm=tm, nyp=nyp)
        extra_in = []
        args = (xp, cp)

    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # xp stays in HBM
            pl.BlockSpec((m * m, tm, nyp), _coef_map,
                         memory_space=pltpu.VMEM),
        ] + extra_in,
        out_specs=pl.BlockSpec((tm, nyp), _row_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nxp, nyp), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rows_slab, xcols), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)
    return y[:nx1, :ny1]


# -- 3D kernels ------------------------------------------------------------------
#
# The 3D stencil apply ((2r+1)³ taps on an (nx1, ny1, nz1) box lattice) is
# decomposed over a (x-row-blocks, 2r+1) grid: chunk c of the innermost grid
# dimension handles the m² taps with x-offset oi = c. That choice makes the
# per-program x operand a plain tm-row slab at leading-dim offset i·tm + c —
# leading-dim DMA slices have no tile-alignment constraint, so no halo
# rounding is needed in x — and caps the VMEM coefficient block at
# m²·tm·nyp·nzp instead of m³·… (125 planes at once would not fit for r=2).
# The output block index ignores c, so Pallas keeps it resident in VMEM and
# the m chunk passes accumulate in place (the standard revisiting pattern).
# x is re-read m times — at 1/m² of the compulsory coefficient traffic that
# is a ≤11% overhead (r=1), shrinking with radius.

_VMEM_BUDGET3 = 10 * 1024 * 1024   # coefficient double-buffer budget, bytes


def padded_shape3(shape: tuple[int, int, int]) -> tuple[int, int, int]:
    """Tile-padded volume shape: x to the max row-block, (y, z) to the
    (8, 128) f32 tile (x is a batch dim — only the grid needs it rounded)."""
    return _ceil_to(shape[0], 8), _ceil_to(shape[1], 8), _ceil_to(shape[2], _LANE)


def _pick_tm3(m: int, nyp: int, nzp: int) -> int | None:
    """Largest row-block in {8,4,2,1} whose double-buffered m²-plane
    coefficient block fits the VMEM budget; None = fall back to XLA."""
    for tm in (8, 4, 2, 1):
        if 2 * m * m * tm * nyp * nzp * 4 <= _VMEM_BUDGET3:
            return tm
    return None


def _x_pipeline3(xp_hbm, xs2, sem2, m: int, tm: int):
    """Double-buffered tm-row x-slab fetch over the flattened (i, c) grid:
    program p = i·m + c waits on its own slab (frame rows i·tm + c ..) and
    prefetches program p+1's. Scratch persists across the sequential grid."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n = pl.num_programs(0) * m
    mm = jnp.asarray(m, i.dtype)
    p = i * mm + c
    two = jnp.asarray(2, i.dtype)
    slot = jax.lax.rem(p, two)
    nxt = jax.lax.rem(p + jnp.asarray(1, i.dtype), two)

    def dma(s, q):
        qi = q // mm
        qc = jax.lax.rem(q, mm)
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(qi * tm + qc, tm), :, :], xs2.at[s], sem2.at[s]
        )

    @pl.when(p == 0)
    def _():
        dma(slot, p).start()

    @pl.when(p + 1 < n)
    def _():
        dma(nxt, p + 1).start()

    dma(slot, p).wait()
    return slot


def _taps3(c_ref, xs, m: int, tm: int, nyp: int, nzp: int):
    acc = c_ref[0] * xs[0:tm, 0:nyp, 0:nzp]
    for t in range(1, m * m):
        oj, ok = divmod(t, m)
        acc += c_ref[t] * xs[0:tm, oj:oj + nyp, ok:ok + nzp]
    return acc


def _mv3_kernel(xp_hbm, c_ref, y_ref, xs2, sem2, *, m, tm, nyp, nzp):
    slot = _x_pipeline3(xp_hbm, xs2, sem2, m, tm)
    acc = _taps3(c_ref, xs2.at[slot], m, tm, nyp, nzp)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        y_ref[:] = acc

    @pl.when(c > 0)
    def _():
        y_ref[:] = y_ref[:] + acc


def _smooth3_kernel(xp_hbm, c_ref, b_ref, invd_ref, om_ref, y_ref,
                    xs2, sem2, xc_s, *, m, tm, nyp, nzp):
    r = (m - 1) // 2
    slot = _x_pipeline3(xp_hbm, xs2, sem2, m, tm)
    xs = xs2.at[slot]
    acc = _taps3(c_ref, xs, m, tm, nyp, nzp)
    c = pl.program_id(1)

    # the center x rows pass through VMEM in chunk c == r; stash them so the
    # final chunk can form x + ω·invd·(b − Ax) without another HBM read
    @pl.when(c == r)
    def _():
        xc_s[:] = xs[0:tm, r:r + nyp, r:r + nzp]

    @pl.when(c == 0)
    def _():
        y_ref[:] = acc

    @pl.when(c > 0)
    def _():
        y_ref[:] = y_ref[:] + acc

    @pl.when(c == m - 1)
    def _():
        y_ref[:] = xc_s[:] + om_ref[0, 0] * invd_ref[:] * (
            b_ref[:] - y_ref[:]
        )


@functools.partial(jax.jit, static_argnames=("shape", "radius", "interpret"))
def stencil_mv3(cp, x, shape, radius, interpret=False):
    """y = A x on a box lattice: cp ((2r+1)³, nxp, nyp, nzp) tile-padded
    coefficient volumes, x flat (n,)."""
    return _apply3(cp, x, None, None, None, shape, radius, interpret)


@functools.partial(jax.jit, static_argnames=("shape", "radius", "interpret"))
def jacobi_smooth3(cp, invd3, b3, x, omega, shape, radius, interpret=False):
    """One fused weighted-Jacobi sweep x + ω·invd·(b − A x) in 3D.

    ``invd3``/``b3`` are (nxp, nyp, nzp) tile-padded volumes (pad once —
    they are loop-invariant across sweeps).
    """
    return _apply3(cp, x, invd3, b3, omega, shape, radius, interpret)


def fits_vmem3(shape: tuple[int, int, int], radius: int) -> bool:
    """Whether the 3D kernels' coefficient chunk fits the VMEM budget."""
    _, nyp, nzp = padded_shape3(shape)
    return _pick_tm3(2 * radius + 1, nyp, nzp) is not None


def _apply3(cp, x, invd3, b3, omega, shape, radius, interpret):
    nx1, ny1, nz1 = shape
    r = radius
    m = 2 * r + 1
    nxp, nyp, nzp = padded_shape3(shape)
    dt = cp.dtype
    tm = _pick_tm3(m, nyp, nzp)
    if tm is None:
        raise ValueError(
            f"3D stencil block (m={m}, plane {nyp}x{nzp}) exceeds the VMEM "
            "budget; guard calls with fits_vmem3()"
        )

    # halo frame: x sits at offset (r, r, r); frame rows cover the last
    # chunk's slab (row nxp - tm + (m-1) + tm = nxp + 2r), (y, z) rounded to
    # the tile so the full-width DMA slices stay aligned
    xrows = nxp + 2 * r
    yph = _ceil_to(nyp + 2 * r, 8)
    zph = _ceil_to(nzp + 2 * r, _LANE)
    x3 = x.reshape(nx1, ny1, nz1).astype(dt)
    xp = jnp.pad(
        x3, ((r, xrows - nx1 - r), (r, yph - ny1 - r), (r, zph - nz1 - r))
    )
    grid = (nxp // tm, m)

    def _out_map(i, c):
        z = jnp.zeros_like(i)
        return (i, z, z)

    def _coef_map(i, c):
        z = jnp.zeros_like(i)
        return (c, i, z, z)

    smooth = invd3 is not None
    if smooth:
        kern = functools.partial(_smooth3_kernel, m=m, tm=tm, nyp=nyp, nzp=nzp)
        om = jnp.asarray(omega, dt).reshape(1, 1)

        def _zero_map(i, c):
            z = jnp.zeros_like(i)
            return (z, z)

        extra_in = [
            pl.BlockSpec((tm, nyp, nzp), _out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, nyp, nzp), _out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), _zero_map, memory_space=pltpu.SMEM),
        ]
        args = (xp, cp, b3.astype(dt), invd3.astype(dt), om)
        extra_scratch = [pltpu.VMEM((tm, nyp, nzp), dt)]
    else:
        kern = functools.partial(_mv3_kernel, m=m, tm=tm, nyp=nyp, nzp=nzp)
        extra_in = []
        args = (xp, cp)
        extra_scratch = []

    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # xp stays in HBM
            pl.BlockSpec((m * m, tm, nyp, nzp), _coef_map,
                         memory_space=pltpu.VMEM),
        ] + extra_in,
        out_specs=pl.BlockSpec((tm, nyp, nzp), _out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nxp, nyp, nzp), dt),
        scratch_shapes=[
            pltpu.VMEM((2, tm, yph, zph), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ] + extra_scratch,
        interpret=interpret,
    )(*args)
    return y[:nx1, :ny1, :nz1].reshape(-1)
