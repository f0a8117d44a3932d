"""Action codec tests (discretize/one-hot/argmax round trips)."""
import numpy as np
import jax.numpy as jnp

from real_robot_nerf_actor_tpu.ops import (
    discretize_action, one_hot_expert_actions, argmax_3d, choose_highest_action)
from real_robot_nerf_actor_tpu.ops.geometry import (
    point_to_voxel_index, voxel_index_to_point)


def test_point_to_voxel_index_reference_math():
    bounds = jnp.asarray([-0.1, -0.3, -0.2, 0.8, 0.7, 0.7])
    # reference: res = range/(v+eps); floor((p-min)/res) clamped above
    p = jnp.asarray([0.353, 0.204, 0.2512])
    idx = np.asarray(point_to_voxel_index(p, 100, bounds))
    res = np.array([0.9, 1.0, 0.9]) / 100
    want = np.floor((np.array([0.353, 0.204, 0.2512]) - np.array([-0.1, -0.3, -0.2])) / res)
    np.testing.assert_array_equal(idx, want.astype(np.int32))
    # clamp above
    idx2 = np.asarray(point_to_voxel_index(jnp.asarray([10.0, 10.0, 10.0]), 100, bounds))
    np.testing.assert_array_equal(idx2, [99, 99, 99])


def test_discretize_rotation_bins():
    bounds = jnp.asarray([0., 0., 0., 1., 1., 1.])
    act = discretize_action(jnp.asarray([[0.5, 0.5, 0.5]]),
                            jnp.asarray([[0.0, -180.0, 175.0]]),
                            jnp.asarray([1.0]), jnp.asarray([1.0]), bounds, 100)
    # reference: bin = int((r+180)/5) - 1
    np.testing.assert_array_equal(np.asarray(act.rot_grip[0]), [35, -1, 70, 1])
    np.testing.assert_array_equal(np.asarray(act.collision[0]), [1])


def test_one_hot_and_argmax_roundtrip():
    rng = np.random.default_rng(0)
    v, r = 20, 72
    trans = jnp.asarray(rng.integers(0, v, size=(3, 3)), dtype=jnp.int32)
    rot_grip = jnp.asarray(
        np.concatenate([rng.integers(0, r, (3, 3)), rng.integers(0, 2, (3, 1))], -1),
        dtype=jnp.int32)
    coll = jnp.asarray(rng.integers(0, 2, (3, 1)), dtype=jnp.int32)
    from real_robot_nerf_actor_tpu.ops.action_codec import DiscreteAction
    oh = one_hot_expert_actions(DiscreteAction(trans, rot_grip, coll), v, r)
    assert oh["trans"].shape == (3, v ** 3)
    assert oh["trans"].sum() == 3

    # argmax of one-hot recovers indices
    q_trans = oh["trans"].reshape(3, v, v, v).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(argmax_3d(q_trans)), np.asarray(trans))

    q_rot_grip = jnp.concatenate(
        [oh["rot_x"], oh["rot_y"], oh["rot_z"], oh["grip"]], -1).astype(jnp.float32)
    coords, rg, cc = choose_highest_action(
        q_trans, q_rot_grip, oh["collision"].astype(jnp.float32), 5.0)
    np.testing.assert_array_equal(np.asarray(coords), np.asarray(trans))
    np.testing.assert_array_equal(np.asarray(rg), np.asarray(rot_grip))
    np.testing.assert_array_equal(np.asarray(cc), np.asarray(coll))


def test_continuous_decode():
    bounds = jnp.asarray([-0.1, -0.3, -0.2, 0.8, 0.7, 0.7])
    idx = jnp.asarray([[10, 20, 30]])
    p = np.asarray(voxel_index_to_point(idx, 100, bounds))
    res = np.array([0.9, 1.0, 0.9]) / 100
    want = np.array([-0.1, -0.3, -0.2]) + res * np.array([10, 20, 30]) + res / 2
    np.testing.assert_allclose(p[0], want, atol=1e-6)
