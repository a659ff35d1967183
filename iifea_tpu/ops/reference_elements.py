"""Lagrange reference elements on simplices (P1/P2 triangle and tetrahedron).

This replaces the reference's use of FEniCS/UFL element tables (SURVEY.md §2.3
N1/N2). Local node ordering follows the Exodus II convention used by the
reference's mesh pipeline (``cell_nodes.csv`` rows are
``(v0, v1, v2, m01, m12, m20)`` for TRI6 — reference: mesh_convert.py:97-119 and
common.py:737-796 edge-matching; TET10 midside order (0,1),(1,2),(2,0),(0,3),
(1,3),(2,3) — common.py:820-825), so Exodus node ids can be adopted directly as
global DOF ids.

All tables are plain numpy: they are static compile-time constants baked into
jitted assembly kernels.
"""
from __future__ import annotations

import numpy as np

# Edges of the reference triangle / tet in Exodus midside order.
TRI_EDGES = np.array([[0, 1], [1, 2], [2, 0]], dtype=np.int32)
TET_EDGES = np.array(
    [[0, 1], [1, 2], [2, 0], [0, 3], [1, 3], [2, 3]], dtype=np.int32
)

# Facets (codim-1 entities) of the reference cell; facet i is opposite vertex i.
TRI_FACETS = np.array([[1, 2], [2, 0], [0, 1]], dtype=np.int32)
TET_FACETS = np.array(
    [[1, 2, 3], [0, 3, 2], [0, 1, 3], [0, 2, 1]], dtype=np.int32
)


def simplex_vertices(dim: int) -> np.ndarray:
    """Reference simplex vertices: unit triangle / unit tetrahedron."""
    return np.vstack([np.zeros(dim), np.eye(dim)])


def _bary(points: np.ndarray) -> np.ndarray:
    """Barycentric coordinates (n, dim+1) of reference-cell points (n, dim)."""
    lam0 = 1.0 - points.sum(axis=1, keepdims=True)
    return np.hstack([lam0, points])


def _dbary(dim: int) -> np.ndarray:
    """d(lambda_i)/d(xi_j), shape (dim+1, dim)."""
    return np.vstack([-np.ones((1, dim)), np.eye(dim)])


class ReferenceElement:
    """Tabulates P1/P2 Lagrange basis values and reference gradients.

    Attributes
    ----------
    dim: topological dimension (2 = triangle, 3 = tet)
    degree: 1 or 2
    n_nodes: number of local nodes (3/6 for tri, 4/10 for tet)
    node_coords: (n_nodes, dim) reference coordinates (vertices then midsides)
    """

    def __init__(self, dim: int, degree: int):
        if dim not in (2, 3):
            raise ValueError(f"unsupported dimension {dim}")
        if degree not in (1, 2):
            # parity with the reference: "only polynomial orders 1 and 2 are
            # currently supported" (common.py:694)
            raise ValueError(f"unsupported degree {degree}")
        self.dim = dim
        self.degree = degree
        verts = simplex_vertices(dim)
        edges = TRI_EDGES if dim == 2 else TET_EDGES
        if degree == 1:
            self.node_coords = verts
        else:
            mids = 0.5 * (verts[edges[:, 0]] + verts[edges[:, 1]])
            self.node_coords = np.vstack([verts, mids])
        self.n_nodes = self.node_coords.shape[0]
        self.edges = edges

    # -- basis tabulation ---------------------------------------------------

    def tabulate(self, points: np.ndarray) -> np.ndarray:
        """Basis values, shape (n_points, n_nodes)."""
        points = np.atleast_2d(np.asarray(points, dtype=np.float64))
        lam = _bary(points)  # (n, dim+1)
        nv = self.dim + 1
        if self.degree == 1:
            return lam
        vals = np.empty((points.shape[0], self.n_nodes))
        vals[:, :nv] = lam * (2.0 * lam - 1.0)
        for e, (i, j) in enumerate(self.edges):
            vals[:, nv + e] = 4.0 * lam[:, i] * lam[:, j]
        return vals

    def tabulate_grad(self, points: np.ndarray) -> np.ndarray:
        """Reference gradients, shape (n_points, n_nodes, dim)."""
        points = np.atleast_2d(np.asarray(points, dtype=np.float64))
        lam = _bary(points)
        dlam = _dbary(self.dim)  # (dim+1, dim)
        nv = self.dim + 1
        n = points.shape[0]
        grads = np.empty((n, self.n_nodes, self.dim))
        if self.degree == 1:
            return np.broadcast_to(dlam, (n, nv, self.dim)).copy()
        grads[:, :nv, :] = (4.0 * lam - 1.0)[:, :, None] * dlam[None, :, :]
        for e, (i, j) in enumerate(self.edges):
            grads[:, nv + e, :] = 4.0 * (
                lam[:, i, None] * dlam[None, j, :]
                + lam[:, j, None] * dlam[None, i, :]
            )
        return grads

    def tabulate_hess(self, points: np.ndarray) -> np.ndarray:
        """Reference Hessians, shape (n_points, n_nodes, dim, dim).

        Needed for the biharmonic operator (second derivatives of P2 basis
        functions are constant on affine cells — reference: biharmonic.py:200).
        """
        points = np.atleast_2d(np.asarray(points, dtype=np.float64))
        dlam = _dbary(self.dim)
        nv = self.dim + 1
        n = points.shape[0]
        hess = np.zeros((n, self.n_nodes, self.dim, self.dim))
        if self.degree == 1:
            return hess
        for v in range(nv):
            hess[:, v] = 4.0 * np.outer(dlam[v], dlam[v])
        for e, (i, j) in enumerate(self.edges):
            sym = np.outer(dlam[i], dlam[j]) + np.outer(dlam[j], dlam[i])
            hess[:, nv + e] = 4.0 * sym
        return hess

    def facet_to_cell_points(self, local_facet: int, fpts: np.ndarray) -> np.ndarray:
        """Map facet-reference points to cell-reference coordinates.

        ``fpts``: (n, dim-1) points on the reference facet simplex (interval
        [0,1] in 2D, unit triangle in 3D). Returns (n, dim) cell coordinates on
        facet ``local_facet`` (vertex order per TRI_FACETS/TET_FACETS).
        """
        facets = TRI_FACETS if self.dim == 2 else TET_FACETS
        verts = simplex_vertices(self.dim)
        fv = verts[facets[local_facet]]  # (dim, dim)
        fpts = np.atleast_2d(np.asarray(fpts, dtype=np.float64))
        lam0 = 1.0 - fpts.sum(axis=1, keepdims=True)
        bary = np.hstack([lam0, fpts])  # (n, dim)
        return bary @ fv
