"""Pallas stencil kernels (interpret mode) vs the pure-jnp reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iifea_tpu.ops.pallas_stencil import (
    jacobi_smooth,
    jacobi_smooth3,
    stencil_mv,
    stencil_mv3,
)
from iifea_tpu.ops.stencil import StencilOperator2D, StencilOperator3D


@pytest.mark.parametrize("shape", [(17, 17), (33, 129), (40, 200)])
@pytest.mark.parametrize("radius", [1, 2])
def test_pallas_mv_matches_reference(shape, radius):
    rng = np.random.default_rng(0)
    m = 2 * radius + 1
    C = rng.standard_normal((m * m, *shape)).astype(np.float32)
    S = StencilOperator2D(jnp.asarray(C), shape, radius)
    x = jnp.asarray(rng.standard_normal(shape[0] * shape[1]).astype(np.float32))
    y_ref = np.asarray(S.mv_ref(x))
    y = np.asarray(
        stencil_mv(S.cp, x, shape, radius, interpret=True)
    )
    assert np.allclose(y, y_ref, atol=1e-4 * np.abs(y_ref).max())


def test_pallas_jacobi_smooth_matches_reference():
    rng = np.random.default_rng(1)
    shape, radius = (21, 35), 2
    m = 2 * radius + 1
    C = rng.standard_normal((m * m, *shape)).astype(np.float32)
    S = StencilOperator2D(jnp.asarray(C), shape, radius)
    n = shape[0] * shape[1]
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    invd = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    om = 0.67
    y_ref = np.asarray(x + om * invd * (b - S.mv_ref(x)))
    y = np.asarray(
        jacobi_smooth(S.cp, S.pad_plane(invd), S.pad_plane(b), x, om,
                      shape, radius, interpret=True)
    )
    assert np.allclose(y, y_ref, atol=1e-4 * np.abs(y_ref).max())


def test_padded_storage_roundtrip():
    rng = np.random.default_rng(2)
    shape, radius = (13, 37), 2
    C = rng.standard_normal((25, *shape)).astype(np.float32)
    S = StencilOperator2D(jnp.asarray(C), shape, radius)
    assert np.allclose(np.asarray(S.coeffs), C)
    assert S.cp.shape[1] % 8 == 0 and S.cp.shape[2] % 128 == 0


@pytest.mark.parametrize("shape", [(9, 9, 9), (13, 10, 17)])
@pytest.mark.parametrize("radius", [1, 2])
def test_pallas_mv3_matches_reference(shape, radius):
    rng = np.random.default_rng(3)
    m = 2 * radius + 1
    C = rng.standard_normal((m ** 3, *shape)).astype(np.float32)
    S = StencilOperator3D(jnp.asarray(C), shape, radius)
    n = shape[0] * shape[1] * shape[2]
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y_ref = np.asarray(S.mv_ref(x))
    y = np.asarray(stencil_mv3(S.cp, x, shape, radius, interpret=True))
    assert np.allclose(y, y_ref, atol=1e-4 * np.abs(y_ref).max())


@pytest.mark.parametrize("radius", [1, 2])
def test_pallas_jacobi_smooth3_matches_reference(radius):
    rng = np.random.default_rng(4)
    shape = (11, 9, 14)
    m = 2 * radius + 1
    C = rng.standard_normal((m ** 3, *shape)).astype(np.float32)
    S = StencilOperator3D(jnp.asarray(C), shape, radius)
    n = shape[0] * shape[1] * shape[2]
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    invd = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    om = 0.67
    y_ref = np.asarray(x + om * invd * (b - S.mv_ref(x)))
    y = np.asarray(
        jacobi_smooth3(S.cp, S.pad_volume(invd), S.pad_volume(b), x, om,
                       shape, radius, interpret=True)
    )
    assert np.allclose(y, y_ref, atol=1e-4 * np.abs(y_ref).max())


def test_padded_storage_roundtrip_3d():
    rng = np.random.default_rng(5)
    shape, radius = (7, 13, 10), 1
    C = rng.standard_normal((27, *shape)).astype(np.float32)
    S = StencilOperator3D(jnp.asarray(C), shape, radius)
    assert np.allclose(np.asarray(S.coeffs), C)
    nxp, nyp, nzp = S.cp.shape[1:]
    assert nxp % 8 == 0 and nyp % 8 == 0 and nzp % 128 == 0
    # pytree round-trip keeps padded storage
    leaves, td = jax.tree_util.tree_flatten(S)
    S2 = jax.tree_util.tree_unflatten(td, leaves)
    assert S2.cp.shape == S.cp.shape and S2.shape == S.shape
