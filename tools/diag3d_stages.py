#!/usr/bin/env python3
"""Stage-by-stage 3D bench pipeline driver: prints which stage OOMs on the
TPU (bench.py's one-line error record hides the failing executable)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

n_bg = int(sys.argv[1]) if len(sys.argv) > 1 else 100


def log(msg):
    print(f"[diag3d +{time.time() - T0:.1f}s] {msg}", flush=True)


def mem(tag):
    """Empirical free-HBM probe: memory_stats() returns zeros through the
    axon tunnel, so bisect the largest f32 allocation that still fits
    (alloc-and-free). INVASIVE — the freed probe block races with the next
    dispatch through the tunnel (measured: assemble OOMed right after an
    8 GB probe) — so it only runs under IIFEA_DIAG_MEM=1."""
    import os

    if not os.environ.get("IIFEA_DIAG_MEM"):
        return
    import jax.numpy as jnp

    lo, hi = 0.0, 16.0
    while hi - lo > 0.25:
        mid = 0.5 * (lo + hi)
        try:
            x = jnp.zeros(int(mid * 1e9 // 4), jnp.float32)
            x.block_until_ready()
            del x
            lo = mid
        except Exception:
            hi = mid
    log(f"mem[{tag}]: largest free block ~{lo:.2f} GB")


T0 = time.time()
from bench import build_problem  # noqa: E402
from iifea_tpu.solvers.lattice_fast import BinnedLatticeSolver  # noqa: E402
import jax  # noqa: E402

mesh_f, prob64, M64 = build_problem(n_bg, np.float64, 3)
log(f"problem built: {mesh_f.n_cells} cells, {M64.n_bg_dofs} bg dofs")
solver = BinnedLatticeSolver(prob64, M64, (n_bg + 1,) * 3)
log("solver setup (host) ok")
mem("setup")
b64, K_cell_b, K_facet = solver.assemble()
jax.block_until_ready(b64)
log("assemble ok")
mem("assemble")
bound = solver.bind(K_cell_b, K_facet)
jax.block_until_ready(bound)
log("bind ok")
mem("bind")
S32 = solver.probe(bound)
jax.block_until_ready(S32.coeffs)
log("probe ok")
mem("probe")
mg = solver.build_mg(S32)
log("mg build ok")
x64, relres, iters = solver.refine(S32, mg, bound, b64, 1e-10)
jax.block_until_ready(x64)
log(f"refine ok: relres={relres:.3e} iters={iters}")


def sync(*vs):
    """One fused readback (block_until_ready does not reliably block
    through the axon tunnel)."""
    import jax.numpy as jnp

    leaves = [jnp.asarray(v) for t in vs
              for v in jax.tree_util.tree_leaves(t)
              if getattr(v, "size", 0)]
    _ = float(sum(w.reshape(-1)[0].astype(jnp.float32) for w in leaves))


# warm per-stage wall clock (everything compiled above); best of 2
stages = [
    ("assemble", lambda: solver.assemble(), ()),
    ("bind", lambda: solver.bind(K_cell_b, K_facet), (K_cell_b, K_facet)),
    ("probe", lambda: solver.probe(bound), (bound,)),
    ("mg_build", lambda: solver.build_mg(S32), (S32,)),
    ("refine", lambda: solver.refine(S32, mg, bound, b64, 1e-10), ()),
]
for name, fn, ins in stages:
    best = None
    for _ in range(2):
        sync(*ins)
        t0 = time.time()
        out = fn()
        sync(out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    log(f"warm {name}: {best:.3f}s")

del S32, mg, bound, b64, x64, out
t0 = time.time()
x64, info = solver.solve(rtol=1e-10)
jax.block_until_ready(x64)
_ = float(np.asarray(x64[0]))
log(f"warm solve: {time.time() - t0:.3f}s {info}")
