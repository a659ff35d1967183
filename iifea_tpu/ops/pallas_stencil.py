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
