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


def test_block_stencil_matches_general_operator():
    """Coupled 2-field operator on a lattice background: block probing is
    exact (elasticity/NS fast-path machinery)."""
    from iifea_tpu.mesh.core import FunctionSpace
    from iifea_tpu.mesh.generators import immersed_square_problem
    from iifea_tpu.ops.assembly import Form, Term, build_cell_domain
    from iifea_tpu.ops.stencil import StencilOperatorBlock2D

    n_bg = 8
    mesh_f, M = immersed_square_problem(n_fg=14, n_bg=n_bg, n_fields=2)
    V = FunctionSpace(mesh_f, degree=1, n_fields=2)

    def coupled_kernel(u_loc, aux_loc, ctx, params):
        # vector Laplacian + symmetric field coupling (grad u0 . grad u1)
        g0 = jnp.einsum("qbd,b->qd", ctx.gphi, u_loc[:, 0])
        g1 = jnp.einsum("qbd,b->qd", ctx.gphi, u_loc[:, 1])
        r0 = jnp.einsum("q,qd,qbd->b", ctx.w, g0 + 0.3 * g1, ctx.gphi)
        r1 = jnp.einsum("q,qd,qbd->b", ctx.w, g1 + 0.3 * g0, ctx.gphi)
        u0 = jnp.einsum("qb,b->q", ctx.phi, u_loc[:, 0])
        u1 = jnp.einsum("qb,b->q", ctx.phi, u_loc[:, 1])
        r0 = r0 + jnp.einsum("q,q,qb->b", ctx.w, u0 + 0.5 * u1, ctx.phi)
        r1 = r1 + jnp.einsum("q,q,qb->b", ctx.w, u1 + 0.5 * u0, ctx.phi)
        return jnp.stack([r0, r1], axis=1)

    cells = np.where(mesh_f.material == 2)[0]
    dom = build_cell_domain(V, cells, 2)
    form = Form(V, [Term(dom, coupled_kernel)])
    blocks = form.jacobian_blocks(jnp.zeros(V.n_dofs))
    A = BackgroundOperator(form, blocks, M)

    S = StencilOperatorBlock2D.probe_multi(
        A.mv_multi, (n_bg + 1, n_bg + 1), n_fields=2, radius=2,
        dtype=jnp.float64,
    )
    err = S.verify(A.mv, n_checks=3)
    assert err < 1e-12, err
    assert np.allclose(np.asarray(S.diag()), np.asarray(A.diag()), atol=1e-12)


def test_probe_multi_chunked_matches_unchunked():
    """Chunked colored probing (bounded-memory lax.map over column chunks)
    matches the single-shot stacked probe to FP reduction-order noise —
    including a chunk size that does not divide the color count."""
    from iifea_tpu.mesh.generators import immersed_cube_problem
    from iifea_tpu.ops.stencil import StencilOperator3D

    n_bg = 6
    mesh_f, M = immersed_cube_problem(n_fg=10, n_bg=n_bg)
    prob = PoissonProblem(mesh_f, k=1, sym=True, beta_value=10)
    blocks = prob.form.jacobian_blocks(jnp.zeros(prob.space.n_dofs))
    A = BackgroundOperator(prob.form, blocks, M)

    S0 = StencilOperator3D.probe_multi(
        A.mv_multi, (n_bg + 1,) * 3, radius=2, dtype=jnp.float64
    )
    S7 = StencilOperator3D.probe_multi(
        A.mv_multi, (n_bg + 1,) * 3, radius=2, dtype=jnp.float64, chunk=7
    )
    # 7 does not divide 125: exercises the zero-padded tail chunk
    assert np.allclose(
        np.asarray(S0.coeffs), np.asarray(S7.coeffs), atol=1e-13, rtol=0
    )


def test_probe_chunk_sizing():
    from iifea_tpu.solvers.ksp import _probe_chunk

    from iifea_tpu.mesh.generators import immersed_cube_problem

    n_bg = 6
    mesh_f, M = immersed_cube_problem(n_fg=10, n_bg=n_bg)
    prob = PoissonProblem(mesh_f, k=1)
    blocks = prob.form.jacobian_blocks(jnp.zeros(prob.space.n_dofs))
    A = BackgroundOperator(prob.form, blocks, M)
    c = _probe_chunk(A, jnp.float64)
    assert c is not None and c >= 1
    # tiny problem: the budget admits far more columns than any probe uses
    assert c > 343
