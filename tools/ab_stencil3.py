#!/usr/bin/env python3
"""A/B the 3D stencil applies on the attached TPU (VERDICT r3 #8).

Measures, per radius:
  mv_xla      pure-XLA shifted-FMA apply (StencilOperator3D.mv_ref)
  mv_pallas   3D Pallas kernel (ops/pallas_stencil.stencil_mv3)
  sm_xla      8 weighted-Jacobi sweeps, XLA body  x + w*invd*(b - A x)
  sm_pallas   8 fused Pallas sweeps (jacobi_smooth3)
  vcycle      one StencilMultigrid3D V-cycle (all-XLA, the product path)

Timing methodology per PERF.md: K applies inside one jitted fori_loop, one
value readback to force completion (block_until_ready does not reliably
block through the axon tunnel). Coefficients are scaled so the iterated
apply neither overflows nor denormals out.

Usage: python tools/ab_stencil3.py [--n 101] [--reps 50] [--radii 1,2]
Prints one JSON line per (radius, variant).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from iifea_tpu.ops import pallas_stencil as ps
from iifea_tpu.ops.multigrid import StencilMultigrid3D, _invd3_l1
from iifea_tpu.ops.stencil import StencilOperator3D


def timed(fn, x, reps, *ops):
    """Best-of-3 wall time of `reps` chained applies inside one jit.

    ``ops`` (coefficient planes, operators) are explicit jit ARGUMENTS:
    closing over a concrete 515 MB radius-2 coefficient array inlined it
    into the lowered module as a literal, overflowing the axon
    remote-compile request (HTTP 413, round 4f)."""
    @jax.jit
    def loop(x, *ops):
        return jax.lax.fori_loop(0, reps, lambda _, v: fn(v, *ops), x)

    float(loop(x, *ops)[0])            # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x, *ops)[0])        # readback sync
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=101, help="lattice points/axis")
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--radii", default="1,2")
    args = ap.parse_args()

    dev = jax.devices()[0]
    shape = (args.n,) * 3
    n = args.n ** 3
    rng = np.random.default_rng(0)
    rows = []
    for r in (int(s) for s in args.radii.split(",")):
        m = 2 * r + 1
        # scale keeps ||A x|| ~ 0.5 ||x||: bounded under chained applies
        C = (0.5 / m ** 1.5) * rng.standard_normal(
            (m ** 3, *shape)
        ).astype(np.float32)
        S = StencilOperator3D(jnp.asarray(C), shape, r)
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        invd = _invd3_l1(S)
        invd3p, b3p = S.pad_volume(invd), S.pad_volume(b)
        om = jnp.float32(1.0)

        # compulsory coefficient traffic per apply, for effective-GB/s
        gb = S.cp.size * 4 / 1e9
        # every large operand rides as a jit argument (see timed)
        variants = {
            "mv_xla": (lambda v, S_: S_.mv_ref(v), (S,)),
            "sm_xla": (lambda v, S_, invd_, b_:
                       v + om * invd_ * (b_ - S_.mv_ref(v)), (S, invd, b)),
        }
        if dev.platform == "tpu" and ps.fits_vmem3(shape, r):
            variants["mv_pallas"] = (
                lambda v, cp: ps.stencil_mv3(cp, v, shape, r), (S.cp,))
            variants["sm_pallas"] = (
                lambda v, cp, invd3p_, b3p_: ps.jacobi_smooth3(
                    cp, invd3p_, b3p_, v, om, shape, r),
                (S.cp, invd3p, b3p))
        for name, (fn, ops) in variants.items():
            t = timed(fn, x, args.reps, *ops)
            rows.append({"radius": r, "variant": name, "n": args.n,
                         "t_apply_s": round(t, 6),
                         "eff_gbps": round(gb / t, 1),
                         "platform": dev.platform})
            print(json.dumps(rows[-1]), flush=True)

        # product-path context: one all-XLA V-cycle at this radius
        mg = StencilMultigrid3D(S)
        t = timed(lambda v, mg_: mg_.minv(v), x, max(args.reps // 5, 5), mg)
        rows.append({"radius": r, "variant": "vcycle_xla", "n": args.n,
                     "t_apply_s": round(t, 6), "platform": dev.platform})
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
