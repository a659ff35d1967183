"""Stencil extraction vs the general matrix-free operator."""
import numpy as np
import jax
import jax.numpy as jnp

from iifea_tpu.mesh.generators import immersed_square_problem
from iifea_tpu.models.poisson import PoissonProblem
from iifea_tpu.ops.projection import BackgroundOperator
from iifea_tpu.ops.stencil import StencilOperator2D


def test_stencil_matches_general_operator():
    n_bg = 16
    mesh_f, M = immersed_square_problem(n_fg=24, n_bg=n_bg)
    prob = PoissonProblem(mesh_f, k=1, sym=True, beta_value=10)
    blocks = prob.form.jacobian_blocks(jnp.zeros(prob.space.n_dofs))
    A = BackgroundOperator(prob.form, blocks, M)

    S = StencilOperator2D.probe(A.mv, (n_bg + 1, n_bg + 1), radius=2,
                                dtype=jnp.float64)
    err = S.verify(A.mv, n_checks=3)
    assert err < 1e-12, err
    # diag matches the exact device diagonal
    assert np.allclose(np.asarray(S.diag()), np.asarray(A.diag()), atol=1e-12)


def test_stencil_cg_solves():
    from iifea_tpu.solvers import krylov
    from iifea_tpu.solvers.precond import jacobi

    n_bg = 16
    mesh_f, M = immersed_square_problem(n_fg=24, n_bg=n_bg)
    prob = PoissonProblem(mesh_f, k=1)
    u0 = jnp.zeros(prob.space.n_dofs)
    blocks = prob.form.jacobian_blocks(u0)
    A = BackgroundOperator(prob.form, blocks, M)
    b = M.rmv(-prob.form.residual(u0))
    S = StencilOperator2D.probe(A.mv, (n_bg + 1, n_bg + 1), radius=2,
                                dtype=jnp.float64)
    d = S.diag()
    d = jnp.where(jnp.abs(d) > 0, d, 1.0)
    x, info = krylov.cg(S.mv, b, minv=jacobi(d), rtol=1e-11)
    x_ref, _ = krylov.cg(A.mv, b, minv=jacobi(A.diag()), rtol=1e-11)
    assert np.allclose(np.asarray(x), np.asarray(x_ref), atol=1e-8)


def test_stencil3d_matches_general_operator():
    from iifea_tpu.mesh.generators import immersed_cube_problem
    from iifea_tpu.ops.stencil import StencilOperator3D

    n_bg = 6
    mesh_f, M = immersed_cube_problem(n_fg=10, n_bg=n_bg)
    prob = PoissonProblem(mesh_f, k=1, sym=True, beta_value=10)
    blocks = prob.form.jacobian_blocks(jnp.zeros(prob.space.n_dofs))
    A = BackgroundOperator(prob.form, blocks, M)

    S = StencilOperator3D.probe_multi(
        A.mv_multi, (n_bg + 1,) * 3, radius=2, dtype=jnp.float64
    )
    err = S.verify(A.mv, n_checks=2)
    assert err < 1e-12, err
    assert np.allclose(np.asarray(S.diag()), np.asarray(A.diag()), atol=1e-12)
