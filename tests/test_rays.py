"""Ray generation + positional encoding golden tests (utils.py:444-567)."""
import numpy as np
import jax.numpy as jnp

from real_robot_nerf_actor_tpu.ops import (
    gen_rays, unproj_map, positional_encoding, PositionalEncodingSpec)


def test_unproj_map_center_pixel_points_forward():
    m = np.asarray(unproj_map(8, 6, 10.0))
    assert m.shape == (6, 8, 3)
    # center pixel (y=3, x=4) has offset (0,0) -> direction (0, 0, -1)
    np.testing.assert_allclose(m[3, 4], [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(m, axis=-1), 1.0, atol=1e-6)


def test_gen_rays_identity_pose():
    pose = jnp.eye(4)[None]
    rays = gen_rays(pose, 4, 4, jnp.asarray(5.0), 1.2, 4.0)
    assert rays.shape == (1, 4, 4, 8)
    r = np.asarray(rays)
    np.testing.assert_allclose(r[..., :3], 0.0, atol=1e-7)  # origins at 0
    np.testing.assert_allclose(r[..., 6], 1.2)
    np.testing.assert_allclose(r[..., 7], 4.0)
    assert (r[..., 5] < 0).all()  # rays look down -z


def test_gen_rays_rotated_pose():
    # rotate camera 90deg about x: -z -> +y becomes look direction... just
    # check direction = R @ cam_dir
    theta = 0.7
    rot = np.array([[1, 0, 0], [0, np.cos(theta), -np.sin(theta)],
                    [0, np.sin(theta), np.cos(theta)]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = rot
    pose[:3, 3] = [1., 2., 3.]
    rays = np.asarray(gen_rays(jnp.asarray(pose)[None], 5, 5, jnp.asarray(7.0), 1., 2.))
    cam_dirs = np.asarray(unproj_map(5, 5, 7.0))
    np.testing.assert_allclose(rays[0, ..., 3:6], cam_dirs @ rot.T, atol=1e-5)
    np.testing.assert_allclose(rays[0, ..., :3], np.broadcast_to([1, 2, 3], (5, 5, 3)), atol=1e-6)


def test_positional_encoding_golden():
    spec = PositionalEncodingSpec(num_freqs=6, d_in=3, freq_factor=1.5, include_input=True)
    assert spec.d_out == 39
    x = jnp.asarray([[0.3, -0.2, 0.9]])
    out = np.asarray(positional_encoding(x, spec))
    assert out.shape == (1, 39)
    np.testing.assert_allclose(out[0, :3], [0.3, -0.2, 0.9], atol=1e-7)
    # first frequency block: sin(1.5*x) then cos(1.5*x)
    np.testing.assert_allclose(out[0, 3:6], np.sin(1.5 * np.array([0.3, -0.2, 0.9])), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos(1.5 * np.array([0.3, -0.2, 0.9])), atol=1e-6)
    # frequency k block ordering
    for k in range(6):
        f = 1.5 * 2 ** k
        np.testing.assert_allclose(out[0, 3 + 6 * k: 6 + 6 * k],
                                   np.sin(f * np.array([0.3, -0.2, 0.9])), atol=1e-5)
