"""Deployment loop test: replay robot, tiny policy, full act loop."""
import numpy as np
import jax

from real_robot_nerf_actor_tpu.data.replay import ReplayRobotIO
from real_robot_nerf_actor_tpu.data.synthetic import (
    make_replay_steps, make_synthetic_demo, make_synthetic_scene)
from real_robot_nerf_actor_tpu.models import PerceiverConfig, PerceiverIO
from real_robot_nerf_actor_tpu.ops import VoxelizerSpec
from real_robot_nerf_actor_tpu.train.serve import (
    PolicyServer, ServeConfig, run_deployment)

BOUNDS = (-0.1, -0.3, -0.2, 0.8, 0.7, 0.7)


def test_run_deployment_replay():
    scene = make_synthetic_scene(seed=0, n_points=3000)
    demo = make_synthetic_demo(scene)
    robot = ReplayRobotIO(make_replay_steps(scene, demo))

    model_cfg = PerceiverConfig(
        depth=1, voxel_size=10, num_latents=16, latent_dim=32, im_channels=8,
        cross_dim_head=8, latent_dim_head=8, latent_heads=2,
        voxel_patch_size=5, final_dim=8, lang_emb_dim=16, lang_max_seq_len=4,
        num_rotation_classes=72)
    net = PerceiverIO(model_cfg)
    vspec = VoxelizerSpec(voxel_size=10, feature_size=3, max_num_coords=4000)
    import jax.numpy as jnp
    variables = net.init(jax.random.key(0), jnp.zeros((1, 10, 10, 10, 10)),
                         jnp.zeros((1, 7)), jnp.zeros((1, 4, 16)))
    lang = np.zeros((4, 16), np.float32)

    server = PolicyServer(ServeConfig(coord_bounds=BOUNDS, num_steps=3),
                          model_cfg, vspec, variables, lang)
    trace = run_deployment(server, robot)
    assert len(trace) == 3
    assert len(robot.commands) == 3
    for a in trace:
        xyz = a["xyz"]
        assert (xyz >= np.array(BOUNDS[:3])).all()
        assert (xyz <= np.array(BOUNDS[3:])).all()
        assert a["gripper_open"] in (0, 1)
        assert a["rotation"].shape == (3,)
        assert -180.0 <= a["rotation"][0] <= 180.0


def test_safety_check_aborts():
    scene = make_synthetic_scene(seed=0, n_points=1000)
    demo = make_synthetic_demo(scene)
    robot = ReplayRobotIO(make_replay_steps(scene, demo))
    model_cfg = PerceiverConfig(
        depth=1, voxel_size=10, num_latents=8, latent_dim=16, im_channels=8,
        cross_dim_head=8, latent_dim_head=8, latent_heads=1,
        voxel_patch_size=5, final_dim=8, lang_emb_dim=8, lang_max_seq_len=4,
        num_rotation_classes=72)
    net = PerceiverIO(model_cfg)
    import jax.numpy as jnp
    variables = net.init(jax.random.key(0), jnp.zeros((1, 10, 10, 10, 10)),
                         jnp.zeros((1, 7)), jnp.zeros((1, 4, 8)))
    server = PolicyServer(
        ServeConfig(coord_bounds=BOUNDS, num_steps=5), model_cfg,
        VoxelizerSpec(voxel_size=10, feature_size=3, max_num_coords=2000),
        variables, np.zeros((4, 8), np.float32))
    trace = run_deployment(server, robot, safety_check=lambda a, o: False)
    assert len(trace) == 1 and trace[0]["aborted"]
    assert len(robot.commands) == 0


def test_scan_deployment_matches_loop():
    """run_deployment_scan (device-side lax.scan horizon) decodes the same
    actions as the sequential loop over the same recording."""
    from real_robot_nerf_actor_tpu.train.serve import run_deployment_scan

    scene = make_synthetic_scene(seed=1, n_points=2000)
    demo = make_synthetic_demo(scene)
    steps = make_replay_steps(scene, demo)
    model_cfg = PerceiverConfig(
        depth=1, voxel_size=10, num_latents=16, latent_dim=32, im_channels=8,
        cross_dim_head=8, latent_dim_head=8, latent_heads=2,
        voxel_patch_size=5, final_dim=8, lang_emb_dim=16, lang_max_seq_len=4,
        num_rotation_classes=72)
    net = PerceiverIO(model_cfg)
    vspec = VoxelizerSpec(voxel_size=10, feature_size=3, max_num_coords=3000)
    import jax.numpy as jnp
    variables = net.init(jax.random.key(0), jnp.zeros((1, 10, 10, 10, 10)),
                         jnp.zeros((1, 7)), jnp.zeros((1, 4, 16)))
    lang = np.zeros((4, 16), np.float32)
    server = PolicyServer(ServeConfig(coord_bounds=BOUNDS, num_steps=4),
                          model_cfg, vspec, variables, lang)
    robot = ReplayRobotIO(steps)
    loop_trace = run_deployment(server, robot, num_steps=4)
    robot2 = ReplayRobotIO(steps)
    scan_trace = run_deployment_scan(server, steps[:4], robot=robot2)
    assert len(scan_trace) == 4 and len(robot2.commands) == 4
    for a, b in zip(loop_trace, scan_trace):
        np.testing.assert_allclose(a["xyz"], b["xyz"], atol=1e-5)
        np.testing.assert_allclose(a["rotation"], b["rotation"], atol=1e-5)
        assert a["gripper_open"] == b["gripper_open"]
