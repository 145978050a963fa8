"""Geometry algebra tests (pure math invariants + reference conventions)."""

import numpy as np
import jax.numpy as jnp

from scene_3dreconstruction_mvsnet_tpu.geometry import (
    compose_projection_matrix,
    invert_rigid,
    pixel_grid,
    pixel_grid_centered,
    depth_to_world_points,
    project_points,
)


def _rigid(rng):
    a = rng.uniform(-0.5, 0.5)
    R = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
        np.float32,
    )
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = rng.uniform(-2, 2, 3)
    return E


def test_compose_projection(rng):
    E = _rigid(rng)
    K = np.array([[100.0, 0, 50], [0, 90.0, 40], [0, 0, 1]], np.float32)
    P = compose_projection_matrix(jnp.asarray(K), jnp.asarray(E))
    expected = E.copy()
    expected[:3, :4] = K @ E[:3, :4]
    np.testing.assert_allclose(np.asarray(P), expected, rtol=1e-6)


def test_invert_rigid(rng):
    E = _rigid(rng)
    inv = np.asarray(invert_rigid(jnp.asarray(E)))
    np.testing.assert_allclose(inv @ E, np.eye(4), atol=1e-6)


def test_pixel_grid_conventions():
    g = np.asarray(pixel_grid(2, 3))
    np.testing.assert_array_equal(g[0], [0, 1, 2, 0, 1, 2])  # x fastest
    np.testing.assert_array_equal(g[1], [0, 0, 0, 1, 1, 1])
    np.testing.assert_array_equal(g[2], np.ones(6))

    gc = np.asarray(pixel_grid_centered(2, 2))
    np.testing.assert_allclose(gc[0], [0.5, 1.5, 0.5, 1.5])
    np.testing.assert_allclose(gc[1], [0.5, 0.5, 1.5, 1.5])


def test_backprojection_project_cycle(rng):
    """depth -> world -> project must land back on the half-pixel grid."""
    H, W = 4, 5
    E = _rigid(rng)
    K = np.array([[80.0, 0, 2.5], [0, 80.0, 2.0], [0, 0, 1]], np.float32)
    depth = rng.uniform(5, 10, (H, W)).astype(np.float32)

    world = depth_to_world_points(
        jnp.asarray(depth), jnp.asarray(K), jnp.asarray(E), xy_scale=1.0
    )
    world_h = jnp.concatenate([world.T, jnp.ones((1, H * W))], axis=0)
    xy, z = project_points(world_h, jnp.asarray(K), jnp.asarray(E))

    grid = np.asarray(pixel_grid_centered(H, W))
    np.testing.assert_allclose(np.asarray(xy), grid[:2], atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), depth.reshape(-1), rtol=1e-5)


def test_depth2pts_magic_scale(rng):
    """The reference applies an empirical 1.0531 factor to world x/y
    (/root/reference/eval.py:264); verify it is applied to x/y only."""
    H, W = 3, 3
    E = np.eye(4, dtype=np.float32)
    K = np.array([[10.0, 0, 1.5], [0, 10.0, 1.5], [0, 0, 1]], np.float32)
    depth = np.ones((H, W), np.float32)
    plain = np.asarray(
        depth_to_world_points(jnp.asarray(depth), jnp.asarray(K), jnp.asarray(E), xy_scale=1.0)
    )
    scaled = np.asarray(
        depth_to_world_points(jnp.asarray(depth), jnp.asarray(K), jnp.asarray(E))
    )
    np.testing.assert_allclose(scaled[:, :2], plain[:, :2] * 1.0531, rtol=1e-6)
    np.testing.assert_allclose(scaled[:, 2], plain[:, 2], rtol=1e-6)
