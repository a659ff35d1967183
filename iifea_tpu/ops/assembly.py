"""Batched FEM assembly engine (the DOLFIN-assembler replacement).

Design (SURVEY.md §7): static mesh arrays -> vmapped per-cell / per-facet
residual kernels (JAX autodiff supplies consistent Jacobians, replacing UFL
``derivative``) -> pre-sorted segment-sum scatter (replacing the PETSc matrix
stash). The global foreground matrix is never materialized on the product
path: operators are applied as gather -> batched-block matvec -> segment-sum,
all shape-static and jit-compiled.

Geometry is affine (all reference meshes are straight-sided simplices), so the
per-cell Jacobian is constant: physical basis gradients are
``gphi_ref @ Jinv`` and Hessians ``Jinvᵀ Href Jinv`` exactly.

Kernel protocol
---------------
A *cell kernel* is ``kernel(u_loc, aux_loc, ctx, params) -> r_loc`` where

  u_loc   (nb, n_fields)  local solution dofs
  aux_loc {name: (nb, n_fields)} extra discrete fields (e.g. u_old)
  ctx     CellCtx: phi (nq,nb), gphi (nq,nb,dim) physical, w (nq,) = wq*|detJ|,
          x (nq,dim) physical quadrature points, h (scalar CellDiameter),
          hess (nq,nb,dim,dim) physical second derivatives (degree-2 only)
  params  problem parameters pytree (time, penalties, ...)

and returns the local residual (nb, n_fields). A *facet kernel* has the same
signature with FacetCtx (adds the outward unit normal ``n`` (dim,)). Facet
terms are one-sided ('+' restriction): the '+' cell is the one with the larger
material marker, matching the reference's reliance on DOLFIN's ordering
("as the block ID > the outside ID ... the positive cells" poisson.py:166).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from iifea_tpu.mesh.core import FunctionSpace, flat_dofs
from iifea_tpu.ops import quadrature
from iifea_tpu.ops.reference_elements import TET_FACETS, TRI_FACETS


class CellCtx(NamedTuple):
    phi: jnp.ndarray
    gphi: jnp.ndarray
    w: jnp.ndarray
    x: jnp.ndarray
    h: jnp.ndarray
    hess: jnp.ndarray | None


class FacetCtx(NamedTuple):
    phi: jnp.ndarray
    gphi: jnp.ndarray
    w: jnp.ndarray
    x: jnp.ndarray
    h: jnp.ndarray
    n: jnp.ndarray
    hess: jnp.ndarray | None


def _register_dataclass_pytree(cls):
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, f) for f in fields), None

    def unflatten(_, leaves):
        return cls(*leaves)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_register_dataclass_pytree
@dataclasses.dataclass
class CellDomain:
    """Integration domain over a selected set of cells."""

    eldofs: jnp.ndarray       # (nE, nb) node ids
    flat_eldofs: jnp.ndarray  # (nE, nb*nF) dof ids
    Jinv: jnp.ndarray         # (nE, dim, dim)
    wdet: jnp.ndarray         # (nE, nq)
    xq: jnp.ndarray           # (nE, nq, dim)
    h: jnp.ndarray            # (nE,)
    phi: jnp.ndarray          # (nq, nb) static table
    gphi_ref: jnp.ndarray     # (nq, nb, dim)
    hess_ref: jnp.ndarray     # (nq, nb, dim, dim)
    scat_gidx: jnp.ndarray    # (n_dofs, Kmax) transpose-gather indices (+1,
                              # 0 = padding) — scatter-free assembly

    def ctx(self) -> CellCtx:
        gphi = jnp.einsum("qbd,Ede->Eqbe", self.gphi_ref, self.Jinv)
        # hess_phys[c,f] = sum_{d,e} Jinv[d,c] Href[d,e] Jinv[e,f] (affine map)
        hess = jnp.einsum(
            "Edc,qbde,Eef->Eqbcf", self.Jinv, self.hess_ref, self.Jinv
        ) if self.hess_ref.size else None
        nE = self.wdet.shape[0]
        phi = jnp.broadcast_to(self.phi, (nE,) + self.phi.shape)
        return CellCtx(phi, gphi, self.wdet, self.xq, self.h, hess)


@_register_dataclass_pytree
@dataclasses.dataclass
class FacetDomain:
    """One-sided ('+') integration domain over a selected set of facets."""

    eldofs: jnp.ndarray       # (nF, nb) plus-cell node ids
    flat_eldofs: jnp.ndarray  # (nF, nb*nFields)
    phi: jnp.ndarray          # (nF, nq, nb)  per-facet tables
    gphi: jnp.ndarray         # (nF, nq, nb, dim) physical gradients
    hess: jnp.ndarray         # (nF, nq, nb, dim, dim) physical hessians
    w: jnp.ndarray            # (nF, nq) = wq * facet measure
    xq: jnp.ndarray           # (nF, nq, dim)
    h: jnp.ndarray            # (nF,) plus-cell diameter
    normal: jnp.ndarray       # (nF, dim) outward unit normal of plus cell
    scat_gidx: jnp.ndarray

    def ctx(self) -> FacetCtx:
        hess = self.hess if self.hess.size else None
        return FacetCtx(
            self.phi, self.gphi, self.w, self.xq, self.h, self.normal, hess
        )


def _scatter_cache(flat_eldofs: np.ndarray, n_dofs: int):
    """Transpose-gather index table: scatter-add as a pure gather+row-sum.

    TPU scatters serialize; instead, for each output dof we precompute the
    (padded) list of positions in the flattened per-element residual array
    that contribute to it. Device-side accumulation is then
    ``concat([0], data)[gidx].sum(-1)`` — gathers and a small reduction, the
    fast path on the VPU. Index 0 is the zero sentinel (stored indices are
    shifted by +1).
    """
    ids = flat_eldofs.ravel()
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    counts = np.bincount(ids, minlength=n_dofs)
    kmax = max(int(counts.max()) if counts.size else 1, 1)
    starts = np.zeros(n_dofs, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(ids.size, dtype=np.int64) - starts[sorted_ids]
    gidx = np.zeros((n_dofs, kmax), dtype=np.int32)
    gidx[sorted_ids, pos] = (order + 1).astype(np.int32)
    return jnp.asarray(gidx)


def gather_scatter(gidx: jnp.ndarray, data_flat: jnp.ndarray) -> jnp.ndarray:
    padded = jnp.concatenate([jnp.zeros(1, data_flat.dtype), data_flat])
    return padded[gidx].sum(axis=-1)


def build_cell_domain(
    space: FunctionSpace,
    cell_ids: np.ndarray,
    quad_degree: int,
    with_hessian: bool = False,
    dtype=np.float64,
) -> CellDomain:
    mesh = space.mesh
    dim = mesh.dim
    cell_ids = np.asarray(cell_ids, dtype=np.int64)
    qp, wq = quadrature.cell_rule(dim, quad_degree)
    el = space.element
    phi = el.tabulate(qp)
    gphi_ref = el.tabulate_grad(qp)
    hess_ref = (
        el.tabulate_hess(qp) if with_hessian else np.zeros((0, 0, 0, 0))
    )
    verts = mesh.cell_coords[cell_ids]          # (nE, dim+1, dim)
    e = verts[:, 1:, :] - verts[:, :1, :]       # rows: edge vectors
    J = np.swapaxes(e, 1, 2)                    # dx/dxi (nE, dim, dim)
    detJ = np.linalg.det(J)
    Jinv = np.linalg.inv(J)
    wdet = np.abs(detJ)[:, None] * wq[None, :]
    bary = np.hstack([1 - qp.sum(1, keepdims=True), qp])  # (nq, dim+1)
    xq = np.einsum("qv,Evd->Eqd", bary, verts)
    eldofs = np.asarray(space.cell_dofs)[cell_ids]
    fl = flat_dofs(eldofs, space.n_fields)
    gidx = _scatter_cache(fl, space.n_dofs)
    dom = CellDomain(
        eldofs=jnp.asarray(eldofs),
        flat_eldofs=jnp.asarray(fl),
        Jinv=jnp.asarray(Jinv.astype(dtype)),
        wdet=jnp.asarray(wdet.astype(dtype)),
        xq=jnp.asarray(xq.astype(dtype)),
        h=jnp.asarray(mesh.cell_diameters[cell_ids].astype(dtype)),
        phi=jnp.asarray(phi.astype(dtype)),
        gphi_ref=jnp.asarray(gphi_ref.astype(dtype)),
        hess_ref=jnp.asarray(hess_ref.astype(dtype)),
        scat_gidx=gidx,
    )
    dom.flat_eldofs_np = fl  # host copy: avoids device downloads in setup paths
    return dom


def build_facet_domain(
    space: FunctionSpace,
    facet_ids: np.ndarray,
    quad_degree: int,
    with_hessian: bool = False,
    dtype=np.float64,
) -> FacetDomain:
    """Builds the '+'-restricted facet domain for interior-facet (dS) or
    exterior-facet (ds) measures.

    For interior facets the '+' cell is the adjacent cell with the larger
    material marker (ties broken by slot order), reproducing the reference's
    orientation convention (poisson.py:166). For boundary facets the only
    adjacent cell is used.
    """
    mesh = space.mesh
    dim = mesh.dim
    fd = mesh.facet_data
    facet_ids = np.asarray(facet_ids, dtype=np.int64)
    c0 = fd.facet_cells[facet_ids, 0]
    c1 = fd.facet_cells[facet_ids, 1]
    m0 = mesh.material[c0]
    m1 = np.where(c1 >= 0, mesh.material[np.maximum(c1, 0)], -(2**30))
    take1 = m1 > m0
    plus_cell = np.where(take1, c1, c0)
    plus_local = np.where(
        take1, fd.facet_local[facet_ids, 1], fd.facet_local[facet_ids, 0]
    )

    local_facets = TRI_FACETS if dim == 2 else TET_FACETS
    el = space.element
    fqp, fwq = quadrature.facet_rule(dim, quad_degree)
    nq = fqp.shape[0]

    # cell-reference coordinates of facet quadrature points, per local facet id
    ref_pts = np.stack(
        [el.facet_to_cell_points(lf, fqp) for lf in range(len(local_facets))]
    )  # (n_local_facets, nq, dim)
    phi_tab = np.stack([el.tabulate(p) for p in ref_pts])
    gphi_tab = np.stack([el.tabulate_grad(p) for p in ref_pts])
    hess_tab = (
        np.stack([el.tabulate_hess(p) for p in ref_pts])
        if with_hessian
        else None
    )

    verts = mesh.cell_coords[plus_cell]           # (nF, dim+1, dim)
    e = verts[:, 1:, :] - verts[:, :1, :]
    J = np.swapaxes(e, 1, 2)
    Jinv = np.linalg.inv(J)

    # facet geometry in the plus cell's local ordering
    fverts = np.take_along_axis(
        verts, local_facets[plus_local][:, :, None].astype(np.int64), axis=1
    )  # (nF, dim, dim)
    if dim == 2:
        t = fverts[:, 1] - fverts[:, 0]
        meas = np.linalg.norm(t, axis=1)
        nrm = np.stack([t[:, 1], -t[:, 0]], axis=1) / meas[:, None]
    else:
        a = fverts[:, 1] - fverts[:, 0]
        b = fverts[:, 2] - fverts[:, 0]
        cr = np.cross(a, b)
        nn = np.linalg.norm(cr, axis=1)
        meas = 0.5 * nn
        nrm = cr / nn[:, None]
    # orient outward from the plus cell
    centroid = verts.mean(axis=1)
    fcent = fverts.mean(axis=1)
    flip = np.einsum("fd,fd->f", nrm, fcent - centroid) < 0
    nrm[flip] *= -1.0

    # physical quadrature points on the facet
    lam0 = 1 - fqp.sum(1, keepdims=True)
    fbary = np.hstack([lam0, fqp])                # (nq, dim)
    xq = np.einsum("qv,Fvd->Fqd", fbary, fverts)

    phi = phi_tab[plus_local]                     # (nF, nq, nb)
    gphi = np.einsum("Fqbd,Fde->Fqbe", gphi_tab[plus_local], Jinv)
    if with_hessian:
        # hess_phys[c,f] = sum_{d,e} Jinv[d,c] Href[d,e] Jinv[e,f] (affine map)
        hess = np.einsum(
            "Fdc,Fqbde,Fef->Fqbcf", Jinv, hess_tab[plus_local], Jinv
        )
    else:
        hess = np.zeros((0, 0, 0, 0, 0))

    w = fwq[None, :] * meas[:, None]
    eldofs = np.asarray(space.cell_dofs)[plus_cell]
    fl = flat_dofs(eldofs, space.n_fields)
    gidx = _scatter_cache(fl, space.n_dofs)
    dom = FacetDomain(
        eldofs=jnp.asarray(eldofs),
        flat_eldofs=jnp.asarray(fl),
        phi=jnp.asarray(phi.astype(dtype)),
        gphi=jnp.asarray(gphi.astype(dtype)),
        hess=jnp.asarray(hess.astype(dtype)),
        w=jnp.asarray(w.astype(dtype)),
        xq=jnp.asarray(xq.astype(dtype)),
        h=jnp.asarray(mesh.cell_diameters[plus_cell].astype(dtype)),
        normal=jnp.asarray(nrm.astype(dtype)),
        scat_gidx=gidx,
    )
    dom.flat_eldofs_np = fl
    return dom


# -- residual / jacobian / operator application ------------------------------


class Term(NamedTuple):
    domain: CellDomain | FacetDomain
    kernel: Callable


class Form:
    """A sum of integral terms over cell/facet domains (a UFL-form analog).

    Registered as a pytree (kernels and sizes are static aux data) so Forms
    and operators built from them can be passed straight into jitted solvers.
    """

    def __init__(self, space: FunctionSpace, terms: list[Term]):
        self.space = space
        self.terms = tuple(terms)
        self.n_dofs = space.n_dofs
        self.n_fields = space.n_fields

    def tree_flatten(self):
        domains = tuple(t.domain for t in self.terms)
        kernels = tuple(t.kernel for t in self.terms)
        return domains, (kernels, self.n_dofs, self.n_fields)

    @classmethod
    def tree_unflatten(cls, aux, domains):
        kernels, n_dofs, n_fields = aux
        obj = object.__new__(cls)
        obj.space = None
        obj.terms = tuple(Term(d, k) for d, k in zip(domains, kernels))
        obj.n_dofs = n_dofs
        obj.n_fields = n_fields
        return obj

    # All methods are pure functions of (u, aux, params): jit at call sites.

    def _gather(self, domain, vec):
        nE, ne = domain.flat_eldofs.shape
        nb = ne // self.n_fields
        return vec[domain.flat_eldofs].reshape(nE, nb, self.n_fields)

    def _scatter(self, domain, r_loc, out_size):
        return gather_scatter(domain.scat_gidx, r_loc.reshape(-1))

    def residual(self, u, aux=None, params=None):
        aux = aux or {}
        r = jnp.zeros(self.n_dofs, dtype=u.dtype)
        for dom, kern in self.terms:
            u_loc = self._gather(dom, u)
            aux_loc = {k: self._gather(dom, v) for k, v in aux.items()}
            ctx = dom.ctx()
            r_loc = jax.vmap(kern, in_axes=(0, 0, 0, None))(
                u_loc, aux_loc, ctx, params
            )
            r = r + self._scatter(dom, r_loc, self.n_dofs)
        return r

    def jacobian_blocks(self, u, aux=None, params=None):
        """Per-term dense element Jacobians K (nE, ne, ne), ne = nb*nF.

        This is the engine's ``derivative(res, u)`` (common.py:434):
        forward-mode autodiff of each local residual kernel.
        """
        aux = aux or {}
        blocks = []
        for dom, kern in self.terms:
            u_loc = self._gather(dom, u)
            aux_loc = {k: self._gather(dom, v) for k, v in aux.items()}
            ctx = dom.ctx()

            def local_jac(ul, al, c, kern=kern):
                nb, nF = ul.shape

                def flat_res(uf):
                    return kern(uf.reshape(nb, nF), al, c, params).reshape(-1)

                return jax.jacfwd(flat_res)(ul.reshape(-1))

            K = jax.vmap(local_jac, in_axes=(0, 0, 0))(u_loc, aux_loc, ctx)
            blocks.append(K)
        return blocks

    def matvec(self, blocks, x):
        """Apply the (foreground) linearized operator: y = A_f x."""
        y = jnp.zeros(self.n_dofs, dtype=x.dtype)
        for (dom, _), K in zip(self.terms, blocks):
            xe = x[dom.flat_eldofs]
            ye = jnp.einsum("eab,eb->ea", K, xe)
            y = y + self._scatter(dom, ye, self.n_dofs)
        return y

    def matvec_multi(self, blocks, X):
        """Multi-RHS operator application: X (n_dofs, k) -> (n_dofs, k)."""
        k = X.shape[1]
        Y = jnp.zeros((self.n_dofs, k), dtype=X.dtype)
        for (dom, _), K in zip(self.terms, blocks):
            xe = X[dom.flat_eldofs]                       # (nE, ne, k)
            ye = jnp.einsum("eab,ebk->eak", K, xe)
            data = ye.reshape(-1, k)
            padded = jnp.concatenate([jnp.zeros((1, k), data.dtype), data])
            Y = Y + padded[dom.scat_gidx].sum(axis=1)
        return Y

    def matvec_t(self, blocks, x):
        """Apply the transposed operator: y = A_fᵀ x (condition estimation)."""
        y = jnp.zeros(self.n_dofs, dtype=x.dtype)
        for (dom, _), K in zip(self.terms, blocks):
            xe = x[dom.flat_eldofs]
            ye = jnp.einsum("eab,ea->eb", K, xe)
            y = y + self._scatter(dom, ye, self.n_dofs)
        return y


jax.tree_util.register_pytree_node_class(Form)


def integrate(domain, kernel, u, aux=None, params=None, n_fields=1):
    """Evaluate a scalar functional ∫ kernel over a cell/facet domain.

    ``kernel(u_loc, aux_loc, ctx, params) -> scalar`` per element. This is the
    engine's ``assemble(inner(e, e)*dx_custom)`` (error norms, poisson.py:216-224).
    """
    aux = aux or {}
    nE, ne = domain.flat_eldofs.shape
    nb = ne // n_fields

    def gather(vec):
        return vec[domain.flat_eldofs].reshape(nE, nb, n_fields)

    u_loc = gather(u)
    aux_loc = {k: gather(v) for k, v in aux.items()}
    vals = jax.vmap(kernel, in_axes=(0, 0, 0, None))(
        u_loc, aux_loc, domain.ctx(), params
    )
    return vals.sum()
