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
    """Device HBM live/peak after a stage (axon exposes memory_stats)."""
    import jax

    try:
        s = jax.local_devices()[0].memory_stats() or {}
        log(f"mem[{tag}]: in_use={s.get('bytes_in_use', 0) / 1e9:.2f}GB "
            f"peak={s.get('peak_bytes_in_use', 0) / 1e9:.2f}GB "
            f"limit={s.get('bytes_limit', 0) / 1e9:.2f}GB "
            f"largest_alloc={s.get('largest_alloc_size', 0) / 1e9:.2f}GB")
    except Exception as e:  # tunnel may not expose stats
        log(f"mem[{tag}]: unavailable ({e})")


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
t0 = time.time()
x64, info = solver.solve(rtol=1e-10)
jax.block_until_ready(x64)
log(f"warm solve: {time.time() - t0:.3f}s {info}")
