"""solveKSP parity: one front-end for all background linear solves.

Maps the reference's solver menu (common.py:509-641) onto the TPU stack:

  method 'gmres' -> restarted (F)GMRES      (jit, on device)
         'cg'    -> preconditioned CG        (jit, on device)
         'gcr'   -> GCR(restart)             (jit, on device)
         'bicgstab'                          (jit, on device)
         'mumps'/'direct' -> host sparse LU  (SuperLU; SURVEY N5 substitution)
  pc     'jacobi' (exact diagonal of Mᵀ A_f M), 'none'
         'bjacobi' field-coupled point-block Jacobi (exact (nf, nf) node
                  blocks via BackgroundOperator.block_diag; needs n_fields>1)
         'mg'     geometric multigrid on a lattice background: the projected
                  operator is probed into stencil form (ops/stencil.py) and
                  preconditioned by a V-cycle (ops/multigrid.py) — the
                  TPU-native replacement for the MUMPS/ILU roles on
                  structured backgrounds; requires ``lattice_shape``.
         ('ASM'/'ICC'/'ILU'/'ILUT' are accepted and degrade to 'jacobi' with a
          warning: incomplete factorizations are inherently sequential and have
          no TPU-native analog.)
"""
from __future__ import annotations

import warnings
import weakref
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from iifea_tpu.ops.projection import BackgroundOperator
from iifea_tpu.solvers import krylov, precond
from iifea_tpu.solvers.direct import solve_direct
from iifea_tpu.solvers.trim import apply_trim_rhs, trim_mask_from_diag

_NO_TPU_PC = {"ASM", "ICC", "ILU", "ILUT"}

# binned-projection tables are a host-side pass over every element plus
# device uploads; repeated solve_ksp(pc='mg') calls on the same (form, M)
# must not pay that setup each time. Weak keys: dropping the form/M frees
# the tables.
_BINNED_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_BINNED_FAIL = object()  # sentinel: binning raised LatticeBinError


def _binned_reducers_cached(form, M, shape, dtype):
    from iifea_tpu.ops import cell_window, lattice_bin

    per_form = _BINNED_CACHE.setdefault(form, weakref.WeakKeyDictionary())
    key_map = per_form.setdefault(M, {})
    key = (shape, np.dtype(dtype).name)
    if key not in key_map:
        build = (
            lattice_bin.build_binned_projection if len(shape) == 2
            else cell_window.build_window_projection
        )
        try:
            key_map[key] = build(form, M, shape, dtype=dtype)
        except lattice_bin.LatticeBinError:
            key_map[key] = _BINNED_FAIL
    out = key_map[key]
    return None if out is _BINNED_FAIL else out


def _probe_chunk(A, dtype) -> int | None:
    """Probe columns per chunk so the stacked mv_multi's live temporaries —
    the (k, ne, nE) element gather, the accumulator, and one (k, ne, nE)
    product per local dof b (Form.matvec_multi's unrolled FMA sum) — stay
    under IIFEA_PROBE_BUDGET_MB (default 2048). A radius-3 probe in 3D is
    343 columns; unchunked on a ~1.6M-element quadratic foreground that is a
    >200 GB allocation. Measured on the v5e (15.75 G hbm): the elasticity
    workload bench at nE=754,974 / ne=6 / k=50 planned 6.43 G padded but
    69% allocator fragmentation pushed it to 20.9 G — hence the honest
    (ne + 3) temp count and a default budget far under physical hbm."""
    import os

    try:
        terms = A.form.terms
    except AttributeError:
        return None
    per_col = 0
    n_temps = 4
    for (dom, _) in terms:
        ne, nE = dom.eldofsT.shape
        if ne * nE > per_col:
            per_col = ne * nE
            n_temps = ne + 3
    if per_col == 0:
        return None
    budget = float(os.environ.get("IIFEA_PROBE_BUDGET_MB", 2048)) * 2 ** 20
    return max(int(budget // (n_temps * per_col * np.dtype(dtype).itemsize)),
               1)


@partial(jax.jit, static_argnames=("method", "pc", "restart", "max_it"))
def _krylov_solve(A, b, x0, diag, rtol, atol, max_it, method, pc, restart):
    if pc == "jacobi":
        minv = precond.jacobi(diag)
    elif pc == "bjacobi":
        minv = precond.block_jacobi(diag)
    else:
        minv = None
    kw = dict(minv=minv, rtol=rtol, atol=atol, max_it=max_it)
    if method == "cg":
        return krylov.cg(A.mv, b, x0, **kw)
    if method == "bicgstab":
        return krylov.bicgstab(A.mv, b, x0, **kw)
    if method == "gcr":
        return krylov.gcr(A.mv, b, x0, restart=restart, **kw)
    return krylov.gmres(A.mv, b, x0, restart=restart, **kw)


def _mg_solve(A, b, x0, lattice_shape, method, rtol, atol, max_it,
              n_fields=1, stencil_radius=2, restart=300):
    """Stencil-probe the projected operator and MG-precondition the Krylov
    solve (the 'mg' pc): the bench.py fast path as a library feature.

    Scalar 2D and 3D lattices and block (multi-field) 2D lattices get the
    geometric-multigrid V-cycle (StencilMultigrid / StencilMultigrid3D /
    StencilMultigridBlock) — always the dense shifted-FMA matvec instead of
    the gather-bound general path."""
    from iifea_tpu.ops.multigrid import (
        StencilMultigrid,
        StencilMultigrid3D,
        StencilMultigridBlock,
        StencilMultigridBlock3D,
    )
    from iifea_tpu.ops.stencil import (
        StencilOperator2D,
        StencilOperator3D,
        StencilOperatorBlock2D,
        StencilOperatorBlock3D,
    )

    shape = tuple(lattice_shape)
    if n_fields > 1:
        opB = (StencilOperatorBlock2D if len(shape) == 2
               else StencilOperatorBlock3D)
        mgB = (StencilMultigridBlock if len(shape) == 2
               else StencilMultigridBlock3D)
        pchunk = _probe_chunk(A, b.dtype)
        S = jax.jit(
            lambda A_: opB.probe_multi(
                A_.mv_multi, shape, n_fields=n_fields, radius=stencil_radius,
                dtype=b.dtype, chunk=pchunk,
            )
        )(A)
        mg = mgB(S)

        # Field-constant null-mode deflation. Enclosed-flow NS (TG class:
        # velocity Dirichlet everywhere, no pressure BC) carries an exact
        # constant-pressure null mode; the reference's plain GMRES+jacobi
        # tolerates it silently, but a V-cycle's coarse (pseudo-)inverse
        # amplifies near-null content into O(1/sigma) garbage. Detect each
        # field's supported-constant vector with one matvec and project it
        # out of the preconditioner's input and output.
        nn = S.nn
        dgf = jnp.stack(
            [S.point_block_diag()[f, f] for f in range(n_fields)]
        )                                                  # (nF, nn)
        sig = float(jnp.abs(S.coeffs).sum(axis=(1, 2)).max())
        qs = []
        for f in range(n_fields):
            v = jnp.zeros((n_fields, nn), b.dtype)
            v = v.at[f].set((jnp.abs(dgf[f]) > 0).astype(b.dtype))
            v = v.reshape(-1)
            vn = float(jnp.linalg.norm(v))
            if vn == 0.0:
                continue
            v = v / vn
            if float(jnp.linalg.norm(S.mv(v))) < 1e-8 * sig:
                qs.append(v)
        Q = jnp.stack(qs) if qs else None

        @partial(jax.jit, static_argnames=("method", "max_it", "restart"))
        def run(S, mgp, Q, b, x0, rtol, atol, method, max_it, restart):
            if Q is None:
                minv = mgp.minv
            else:
                def minv(r):
                    r = r - Q.T @ (Q @ r)
                    z = mgp.minv(r)
                    return z - Q.T @ (Q @ z)
            kw = dict(minv=minv, rtol=rtol, atol=atol, max_it=max_it)
            if method == "cg":
                return krylov.cg(S.mv, b, x0, **kw)
            return krylov.gmres(S.mv, b, x0, restart=restart, **kw)

        return run(
            S, mg, Q, b, x0, jnp.asarray(rtol, b.dtype),
            jnp.asarray(atol, b.dtype), method, int(max_it), int(restart),
        )

    op = StencilOperator2D if len(shape) == 2 else StencilOperator3D
    S = None
    if (A.trim_mask is None and A.form.space is not None
            and stencil_radius == 2):
        # the binned/window reducers assume the degree-1 simplex lattice
        # (radius-2) geometry; other radii (e.g. 3 for quadratic B-spline
        # backgrounds) take the general colored probe
        # gather-free binned probe (ops/lattice_bin.py in 2D, cell-window
        # congruence assembly in 3D) when the term geometry permits; falls
        # back to the general probe otherwise
        from iifea_tpu.ops import cell_window, lattice_bin

        reducers = _binned_reducers_cached(
            A.form, A.M, shape, np.dtype(b.dtype).type
        )
        if reducers is not None:
            if len(shape) == 2:
                @jax.jit
                def _probe_binned(reds, blocks):
                    Y = lattice_bin.probe_y_binned(reds, blocks)
                    return StencilOperator2D.from_probe_y(
                        Y, shape, radius=2, dtype=b.dtype
                    )
            else:
                @jax.jit
                def _probe_binned(reds, blocks):
                    bound = [
                        r.bind_blocks(K.astype(b.dtype))
                        for r, K in zip(reds, blocks)
                    ]
                    C = cell_window.stencil_coeffs_windows(reds, bound)
                    return StencilOperator3D(C, shape, 2)

            S = _probe_binned(reducers, A.blocks)
    if S is None:
        pchunk = _probe_chunk(A, b.dtype)
        S = jax.jit(
            lambda A_: op.probe_multi(
                A_.mv_multi, shape, radius=stencil_radius, dtype=b.dtype,
                chunk=pchunk,
            )
        )(A)
    mg = (
        StencilMultigrid(S) if len(shape) == 2 else StencilMultigrid3D(S)
    )

    @partial(jax.jit, static_argnames=("method", "max_it", "restart"))
    def run(S, mgp, b, x0, rtol, atol, method, max_it, restart):
        if mgp is not None:
            minv = mgp.minv
            # mv_ref, not the Pallas mv: the V-cycle contains transfer
            # convolutions, and a Pallas custom call in the same loop body
            # forces them into a degenerate slow conv emitter (PERF.md)
            mv = S.mv_ref if hasattr(S, "mv_ref") else S.mv
        else:
            d = S.diag()
            invd = 1.0 / jnp.where(jnp.abs(d) > 0, d, 1.0)
            minv = lambda r: invd * r
            mv = S.mv
        kw = dict(minv=minv, rtol=rtol, atol=atol, max_it=max_it)
        if method == "cg":
            return krylov.cg(mv, b, x0, **kw)
        return krylov.gmres(mv, b, x0, restart=restart, **kw)

    return run(
        S, mg, b, x0, jnp.asarray(rtol, b.dtype), jnp.asarray(atol, b.dtype),
        method, int(max_it), int(restart),
    )


def solve_ksp(
    A: BackgroundOperator,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    method: str = "gmres",
    pc: str = "jacobi",
    rtol: float = 1e-8,
    atol: float = 1e-9,
    max_it: int = 1000000,
    gmres_restart: int = 300,
    bfr_tol: float | None = None,
    bfr_b: bool = True,
    monitor: bool = True,
    lattice_shape: tuple | None = None,
    n_fields: int = 1,
    stencil_radius: int = 2,
):
    """Solve A u = b on the background space. Returns (u, info|None)."""
    method = method or "gmres"
    pc = pc or "jacobi"
    if pc in _NO_TPU_PC:
        warnings.warn(
            f"preconditioner '{pc}' has no TPU-native analog; using 'jacobi' "
            "(see solvers/precond.py)", stacklevel=2
        )
        pc = "jacobi"

    if bfr_tol is not None:
        # remove_zero_diagonal path of solveKSP (common.py:529-533, 565-566)
        diag0 = A.diag()
        mask = trim_mask_from_diag(diag0, bfr_tol)
        A = A.with_trim(mask)
        if bfr_b:
            b = apply_trim_rhs(b, mask)

    if method in ("mumps", "direct"):
        A_sp = A.to_scipy()
        u = solve_direct(A_sp, np.asarray(b))
        return jnp.asarray(u), None

    x0 = jnp.zeros_like(b) if x0 is None else x0
    if pc == "mg":
        if lattice_shape is None:
            raise ValueError("pc='mg' requires lattice_shape=(nx+1, ny+1[, nz+1])")
        x, info = _mg_solve(A, b, x0, lattice_shape, method, rtol, atol,
                            max_it, n_fields=n_fields,
                            stencil_radius=stencil_radius,
                            restart=gmres_restart)
        if monitor:
            _print_monitor(info)
        return x, info
    if pc == "bjacobi" and n_fields <= 1:
        warnings.warn(
            "pc='bjacobi' with a single field is pointwise jacobi; "
            "pass n_fields>1 for field-coupled blocks", stacklevel=2
        )
        pc = "jacobi"
    if pc == "bjacobi":
        # field-coupled point-block diagonal (PCBJACOBI, common.py:568-616)
        diag = A.block_diag(n_fields)
    elif pc == "jacobi":
        diag = A.diag()
    else:
        diag = jnp.ones_like(b)
    x, info = _krylov_solve(
        A, b, x0, diag,
        jnp.asarray(rtol, b.dtype), jnp.asarray(atol, b.dtype),
        int(max_it), method, pc, int(gmres_restart),
    )
    if monitor:
        _print_monitor(info)
    return x, info


def _print_monitor(info):
    print(
        f"Converged in {int(info.iters)} iterations. "
        f"(residual norm {float(info.resnorm):.3e})"
    )
    if info.history is not None:
        h = np.asarray(info.history)
        print("Convergence history:", h[h >= 0].tolist())
