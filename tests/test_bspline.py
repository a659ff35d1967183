"""B-spline space: partition of unity, polynomial reproduction, extraction."""
import numpy as np
import jax.numpy as jnp
import pytest

from iifea_tpu.mesh.bspline import (
    BSplineSpace2D,
    basis_values,
    uniform_open_knots,
)


def test_partition_of_unity_1d():
    for p in (1, 2, 3):
        knots = uniform_open_knots(p, 7, -1.0, 2.0)
        x = np.linspace(-1, 2, 113)
        _, vals = basis_values(knots, p, x)
        assert np.allclose(vals.sum(1), 1.0)
        assert (vals >= -1e-14).all()


def test_linear_reproduction_1d():
    # quadratic splines reproduce x exactly via Greville coefficients
    p = 2
    knots = uniform_open_knots(p, 5, 0.0, 1.0)
    n = len(knots) - p - 1
    grev = np.array([knots[i + 1:i + p + 1].mean() for i in range(n)])
    x = np.linspace(0, 1, 57)
    spans, vals = basis_values(knots, p, x)
    recon = np.zeros_like(x)
    for j in range(p + 1):
        recon += vals[:, j] * grev[spans - p + j]
    assert np.allclose(recon, x, atol=1e-13)


def test_2d_extraction_partition_of_unity():
    sp = BSplineSpace2D(2, (4, 5), (-2.0, -2.0), (2.0, 2.0))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, (200, 2))
    M = sp.transfer_matrix(pts)
    ones = np.asarray(M.mv(jnp.ones(sp.n_dofs)))
    assert np.allclose(ones, 1.0)


def test_2d_extraction_bilinear_reproduction():
    sp = BSplineSpace2D(2, (3, 3), (0.0, 0.0), (1.0, 1.0))
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (150, 2))
    M = sp.transfer_matrix(pts)
    grev = sp.greville_points()
    # coefficients = Greville x-coordinates reproduce u(x,y) = x
    c = jnp.asarray(grev[:, 0])
    vals = np.asarray(M.mv(c))
    assert np.allclose(vals, pts[:, 0], atol=1e-12)


def test_outside_points_zero_rows():
    sp = BSplineSpace2D(2, (3, 3), (0.0, 0.0), (1.0, 1.0))
    pts = np.array([[0.5, 0.5], [2.0, 0.5], [-1.0, -1.0]])
    M = sp.transfer_matrix(pts)
    ones = np.asarray(M.mv(jnp.ones(sp.n_dofs)))
    assert np.isclose(ones[0], 1.0)
    assert ones[1] == 0.0 and ones[2] == 0.0


def test_bspline_extraction_reproduces_in_space_functions_at_nodes():
    """The transfer matrix evaluates the spline basis exactly, so any
    function IN the spline space (here a global quadratic) is reproduced at
    every fg node to machine precision — on nested AND straddling grids
    alike. (The nesting requirement diagnosed in round 3 is about the
    downstream P2 interpolant BETWEEN nodes across spline knot lines, which
    only bites for splines with active C1 kinks — see
    mesh/generators.py:immersed_square_bspline_problem and the
    biharmonic_synthetic steep study.)"""
    import numpy as np
    from iifea_tpu.mesh.generators import immersed_square_bspline_problem
    from iifea_tpu.mesh.core import FunctionSpace

    n_bg = 8
    for n_fg in (2 * n_bg, 2 * (n_bg + 1)):
        mesh_f, M, ncp = immersed_square_bspline_problem(
            n_fg=n_fg, n_bg=n_bg)
        Vf = FunctionSpace(mesh_f, degree=2, n_fields=1)
        xy = np.asarray(Vf.node_coords)
        u_ex = xy[:, 0] ** 2 + 0.5 * xy[:, 1] ** 2 + xy[:, 0] * xy[:, 1]
        # solve the (tall, exact) collocation system for control values
        A = np.asarray(M.to_scipy().todense())
        coef, *_ = np.linalg.lstsq(A, u_ex, rcond=None)
        err = float(np.max(np.abs(A @ coef - u_ex)))
        assert err < 1e-10, (n_fg, err)
