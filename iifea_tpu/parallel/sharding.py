"""SPMD multi-device execution — the MPI domain-decomposition replacement.

The reference scales by MPI rank-partitioning the mesh (DOLFIN ghost facets,
PETSc row-distributed matrices, VecScatter halos — SURVEY.md §2.4/N7). The
TPU-native restatement implemented here:

* **cells/facets are sharded** across the device mesh axis 'dp' (element
  batches are embarrassingly parallel; chunks are padded with zero-weight
  elements, which contribute exactly nothing);
* **the background DOF vector is replicated** (it is the coarse space —
  much smaller than the foreground);
* the extraction operator is **fused into the element gather**: each device
  evaluates the solution at its own cells directly from the background
  vector, u_loc[e,a] = Σ_k val[g,k]·x[idx[g,k]] with g = eldofs[e,a], so no
  foreground halo exchange exists at all (the reference needs ghost_mode=
  "shared_facet" + VecScatter for the same purpose);
* every assembly/operator application ends in ONE ``psum`` of a
  background-sized array over ICI — the analog of matrix-stash exchange +
  MPI_Allreduce, as a single dense collective.

Krylov iterations run *outside* shard_map on replicated vectors, so dot
products need no additional collectives.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from iifea_tpu.ops.assembly import CellCtx, CellDomain, FacetCtx, FacetDomain, Form
from iifea_tpu.ops.extraction import ExtractionOperator


def make_device_mesh(n_devices: int | None = None) -> DeviceMesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return DeviceMesh(np.array(devs[:n]), ("dp",))


def _pad_to(arr: np.ndarray, n: int):
    arr = np.asarray(arr)
    pad = n - arr.shape[0]
    if pad == 0:
        # always writable: inputs may be read-only views of device buffers
        return np.array(arr)
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(o):
        return tuple(getattr(o, f) for f in fields), None

    jax.tree_util.register_pytree_node(cls, flatten, lambda _, l: cls(*l))
    return cls


@_register
@dataclasses.dataclass
class FusedTerm:
    """One integral term with extraction fused in, sharded over 'dp'.

    sharded leading-axis arrays: geometry + Fidx/Fval; replicated: tables.
    """

    Fidx: jnp.ndarray   # (nE, ne, km) background dof ids per local dof
    Fval: jnp.ndarray   # (nE, ne, km) extraction weights
    geom: tuple         # domain-kind-specific sharded geometry arrays
    tables: tuple       # replicated static tables


def _fuse_term(dom, M: ExtractionOperator, n_dev: int):
    Midx = M.idx_np
    Mval = M.val_np
    fl = getattr(dom, "flat_eldofs_np", None)
    if fl is None:
        fl = np.asarray(dom.flat_eldofs)
    nE = fl.shape[0]
    nE_pad = -(-nE // n_dev) * n_dev
    Fidx = _pad_to(Midx[fl], nE_pad)
    Fval = _pad_to(Mval[fl], nE_pad)
    if isinstance(dom, CellDomain):
        geom = tuple(
            _pad_to(np.asarray(a), nE_pad)
            for a in (dom.Jinv, dom.wdet, dom.xq, dom.h)
        )
        # pad h with 1 to avoid div-by-zero in h^-1 penalties of padded cells
        geom[3][nE:] = 1.0
        g2 = list(geom)
        tables = (np.asarray(dom.phi), np.asarray(dom.gphi_ref),
                  np.asarray(dom.hess_ref))
        kind = "cell"
        geom = tuple(g2)
    else:
        geom = tuple(
            _pad_to(np.asarray(a), nE_pad)
            for a in (dom.phi, dom.gphi, dom.hess, dom.w, dom.xq, dom.h,
                      dom.normal)
        )
        geom[5][nE:] = 1.0
        tables = ()
        kind = "facet"
    return kind, Fidx, Fval, geom, tables


def _local_ctx(kind, geom, tables):
    if kind == "cell":
        Jinv, wdet, xq, h = geom
        phi, gphi_ref, hess_ref = tables
        gphi = jnp.einsum("qbd,Ede->Eqbe", gphi_ref, Jinv)
        hess = (
            jnp.einsum("Edc,qbde,Eef->Eqbcf", Jinv, hess_ref, Jinv)
            if hess_ref.size else None
        )
        nE = wdet.shape[0]
        phi_b = jnp.broadcast_to(phi, (nE,) + phi.shape)
        return CellCtx(phi_b, gphi, wdet, xq, h, hess)
    phi, gphi, hess, w, xq, h, normal = geom
    return FacetCtx(phi, gphi, w, xq, h, normal,
                    hess if hess.size else None)


class ShardedProjectedSystem:
    """The full background system under SPMD sharding.

    Provides jit-compatible assemble/residual/matvec/diag, each one
    shard_map region ending in a single psum.
    """

    def __init__(self, form: Form, M: ExtractionOperator, mesh: DeviceMesh):
        self.form = form
        self.M = M
        self.mesh = mesh
        self.n = M.n_bg_dofs
        self.n_fields = form.n_fields
        n_dev = mesh.devices.size
        shard = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())

        self.kinds, self.kernels, self.terms = [], [], []
        for dom, kern in form.terms:
            kind, Fidx, Fval, geom, tables = _fuse_term(dom, M, n_dev)
            self.kinds.append(kind)
            self.kernels.append(kern)
            self.terms.append(
                FusedTerm(
                    Fidx=jax.device_put(Fidx, shard),
                    Fval=jax.device_put(Fval, shard),
                    geom=tuple(jax.device_put(g, shard) for g in geom),
                    tables=tuple(jax.device_put(t, repl) for t in tables),
                )
            )

        spec_term = FusedTerm(
            Fidx=P("dp"), Fval=P("dp"),
            geom=tuple(P("dp") for _ in self.terms[0].geom) if self.terms else (),
            tables=(),
        )
        self._specs = [
            FusedTerm(P("dp"), P("dp"), tuple(P("dp") for _ in t.geom),
                      tuple(P() for _ in t.tables))
            for t in self.terms
        ]
        del spec_term

    # -- local helpers --------------------------------------------------------

    def _gather_local(self, Fidx, Fval, x):
        """u_loc (nE, nb, nF) from the replicated background vector."""
        vals = (Fval * x[Fidx]).sum(-1)               # (nE, ne)
        nE, ne = vals.shape
        return vals.reshape(nE, ne // self.n_fields, self.n_fields)

    def _scatter_local(self, Fidx, Fval, r_loc, n):
        data = (r_loc.reshape(*Fval.shape[:2], 1) * Fval).reshape(-1)
        return jax.ops.segment_sum(data, Fidx.reshape(-1), num_segments=n)

    # -- public ops (jit-compatible) ------------------------------------------

    def residual_b(self, u_p, params=None):
        """r_b = Mᵀ R(M u_p): fused, sharded, one psum per term."""
        out = jnp.zeros(self.n, u_p.dtype)
        for i, term in enumerate(self.terms):
            kern, kind = self.kernels[i], self.kinds[i]

            @partial(shard_map, mesh=self.mesh,
                     in_specs=(self._specs[i], P()), out_specs=P())
            def term_res(t, x, kern=kern, kind=kind):
                u_loc = self._gather_local(t.Fidx, t.Fval, x)
                ctx = _local_ctx(kind, t.geom, t.tables)
                r_loc = jax.vmap(kern, in_axes=(0, 0, 0, None))(
                    u_loc, {}, ctx, params
                )
                contrib = self._scatter_local(t.Fidx, t.Fval, r_loc, self.n)
                return jax.lax.psum(contrib, "dp")

            out = out + term_res(term, u_p)
        return out

    def assemble_blocks(self, u_p, params=None):
        """Sharded element Jacobians K (kept sharded for matvec/diag)."""
        blocks = []
        for i, term in enumerate(self.terms):
            kern, kind = self.kernels[i], self.kinds[i]

            @partial(shard_map, mesh=self.mesh,
                     in_specs=(self._specs[i], P()), out_specs=P("dp"))
            def term_blocks(t, x, kern=kern, kind=kind):
                u_loc = self._gather_local(t.Fidx, t.Fval, x)
                ctx = _local_ctx(kind, t.geom, t.tables)

                def local_jac(ul, c):
                    nb, nF = ul.shape

                    def flat_res(uf):
                        return kern(uf.reshape(nb, nF), {}, c, params).reshape(-1)

                    return jax.jacfwd(flat_res)(ul.reshape(-1))

                return jax.vmap(local_jac)(u_loc, ctx)

            blocks.append(term_blocks(term, u_p))
        return blocks

    def matvec(self, blocks, x):
        y = jnp.zeros(self.n, x.dtype)
        for i, term in enumerate(self.terms):

            @partial(shard_map, mesh=self.mesh,
                     in_specs=(P("dp"), P("dp"), P("dp"), P()), out_specs=P())
            def term_mv(K, Fidx, Fval, xx):
                xe = (Fval * xx[Fidx]).sum(-1)
                ye = jnp.einsum("eab,eb->ea", K, xe)
                contrib = self._scatter_local(Fidx, Fval, ye, self.n)
                return jax.lax.psum(contrib, "dp")

            y = y + term_mv(blocks[i], term.Fidx, term.Fval, x)
        return y

    def diag(self, blocks):
        d = jnp.zeros(self.n, blocks[0].dtype)
        for i, term in enumerate(self.terms):

            @partial(shard_map, mesh=self.mesh,
                     in_specs=(P("dp"), P("dp"), P("dp")), out_specs=P())
            def term_diag(K, Fidx, Fval):
                eq = Fidx[:, :, :, None, None] == Fidx[:, None, None, :, :]
                T = jnp.einsum(
                    "eab,eaKbL,ebL->eaK", K, eq.astype(K.dtype), Fval
                ) * Fval
                dd = jax.ops.segment_sum(
                    T.reshape(-1), Fidx.reshape(-1), num_segments=self.n
                )
                return jax.lax.psum(dd, "dp")

            d = d + term_diag(blocks[i], term.Fidx, term.Fval)
        return d

    def make_step(self, rtol=1e-8, atol=1e-12, max_it=500):
        """The jittable full step: assemble -> project -> PCG -> update."""
        from iifea_tpu.solvers import krylov
        from iifea_tpu.solvers.precond import jacobi

        def step(u_p, params=None):
            blocks = self.assemble_blocks(u_p, params)
            b = -self.residual_b(u_p, params)
            d = self.diag(blocks)
            du, info = krylov.cg(
                lambda v: self.matvec(blocks, v), b,
                minv=jacobi(d), rtol=rtol, atol=atol, max_it=max_it,
            )
            return u_p + du, info.resnorm

        return step
