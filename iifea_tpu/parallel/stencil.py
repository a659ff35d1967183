"""Multi-device stencil operators: the hot path under SPMD sharding.

The stencil-form background operator (ops/stencil.py) is the product compute
pattern; at multi-chip scale the lattice is split into contiguous ROW BLOCKS
across the 'dp' mesh axis (the domain-decomposition analog of the reference's
MPI row-distributed PETSc matrices). Each device owns

    x_local (rows_loc, ny1)      its slab of the solution plane
    C_local (m², rows_loc, ny1)  its slab of every coefficient plane

and one application is: exchange 2r halo rows with the two neighbors over
ICI (``jax.lax.ppermute`` — non-cyclic, boundary devices receive zeros,
which matches the zero Dirichlet halo of the single-device kernel), then
(2r+1)² shifted FMAs on the local slab. Krylov loops run on the sharded
vectors directly: dot products and norms lower to one ``psum`` each under
jit — no rank-conditional code, SPMD by construction (SURVEY.md §2.4/N7).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from iifea_tpu.ops.stencil import StencilOperator2D


class ShardedStencil2D:
    """Row-block sharded StencilOperator2D over a 1D 'dp' device mesh.

    Rows are padded to a multiple of the device count; padded rows carry
    zero coefficients so they contribute nothing (same convention as the
    single-device tile padding).
    """

    def __init__(self, S: StencilOperator2D, mesh: DeviceMesh):
        self.mesh = mesh
        self.shape = S.shape
        self.radius = S.radius
        self.n = S.n
        nx1, ny1 = S.shape
        ndev = mesh.devices.size
        self.nxs = -(-nx1 // ndev) * ndev          # sharded row count

        C = S.coeffs                               # (m², nx1, ny1) logical
        Cp = jnp.pad(C, ((0, 0), (0, self.nxs - nx1), (0, 0)))
        self.C = jax.device_put(
            Cp, NamedSharding(mesh, P(None, "dp", None))
        )
        self._x_sharding = NamedSharding(mesh, P("dp", None))

        r = self.radius
        m = 2 * r + 1
        axis = mesh.axis_names[0]
        fwd = [(i, i + 1) for i in range(ndev - 1)]
        bwd = [(i + 1, i) for i in range(ndev - 1)]

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P("dp", None), P(None, "dp", None)),
            out_specs=P("dp", None),
        )
        def _mv2(x2, C):
            # halo exchange: my bottom rows -> next device's top halo, my
            # top rows -> previous device's bottom halo (zeros at the ends)
            top_halo = jax.lax.ppermute(x2[-r:], axis, fwd)
            bot_halo = jax.lax.ppermute(x2[:r], axis, bwd)
            xs = jnp.concatenate([top_halo, x2, bot_halo], axis=0)
            xs = jnp.pad(xs, ((0, 0), (r, r)))
            rows = x2.shape[0]
            y = jnp.zeros_like(x2)
            for k in range(m * m):
                oi, oj = divmod(k, m)
                y = y + C[k] * jax.lax.dynamic_slice(
                    xs, (oi, oj), (rows, x2.shape[1])
                )
            return y

        self._mv2 = _mv2

    def shard_vec(self, x: jnp.ndarray) -> jnp.ndarray:
        """Flat (n,) -> row-sharded (nxs, ny1) plane."""
        nx1, ny1 = self.shape
        x2 = jnp.pad(x.reshape(nx1, ny1), ((0, self.nxs - nx1), (0, 0)))
        return jax.device_put(x2, self._x_sharding)

    def unshard_vec(self, x2: jnp.ndarray) -> jnp.ndarray:
        return x2[: self.shape[0], :].reshape(-1)

    def mv2(self, x2: jnp.ndarray) -> jnp.ndarray:
        """Sharded-plane matvec: (nxs, ny1) -> (nxs, ny1)."""
        return self._mv2(x2, self.C)

    def mv(self, x: jnp.ndarray) -> jnp.ndarray:
        """Flat-vector interface (shards, applies, gathers)."""
        return self.unshard_vec(self.mv2(self.shard_vec(x)))

    def diag2(self) -> jnp.ndarray:
        r = self.radius
        m = 2 * r + 1
        return self.C[r * m + r]
