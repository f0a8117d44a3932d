"""Data layer tests: PLY round-trip, keyframe parsing, replay, synthetic."""
import numpy as np

from real_robot_nerf_actor_tpu.data import (
    read_ply, write_ply, parse_xarm_position_file, extract_keyframes,
    make_synthetic_scene, make_synthetic_demo)
from real_robot_nerf_actor_tpu.data.replay import (
    load_rgb_pcd, pad_point_cloud, PointCloudSample)


def test_ply_roundtrip_binary(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    p = str(tmp_path / "a.ply")
    write_ply(p, pts, cols, binary=True)
    pts2, cols2 = read_ply(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255.0)


def test_ply_roundtrip_ascii(tmp_path):
    pts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]], np.float32)
    p = str(tmp_path / "b.ply")
    write_ply(p, pts, None, binary=False)
    pts2, cols2 = read_ply(p)
    np.testing.assert_allclose(pts2, pts)
    assert cols2 is None


def test_parse_xarm_position_file(tmp_path):
    p = str(tmp_path / "0_xarm_position.txt")
    with open(p, "w") as f:
        f.write("[300.0, 100.0, 200.0, 180.0, 0.0, 45.0, True]\n")
        f.write("[310.0, 110.0, 150.0, 180.0, 0.0, 45.0, False]\n")
    demo = parse_xarm_position_file(p)
    assert demo.num_keyframes == 2
    np.testing.assert_allclose(demo.xyz[0], [0.3, 0.1, 0.2], atol=1e-6)
    np.testing.assert_allclose(demo.rotation[1], [180.0, 0.0, 45.0])
    np.testing.assert_array_equal(demo.gripper_open, [1.0, 0.0])


def test_extract_keyframes():
    grip = [1, 1, 1, 0, 0, 0, 1, 1]
    roll = [0, 10, 20, 30, 30, 30, 30, 30]
    keys = extract_keyframes(grip, roll)
    assert 3 in keys       # gripper closes
    assert 6 in keys       # gripper opens
    assert 7 in keys       # last frame
    assert keys == sorted(set(keys))


def test_load_rgb_pcd_transform_and_filter(tmp_path):
    pts = np.array([[0.1, 0.2, 0.3], [5.0, 5.0, 5.0]], np.float32)  # 2nd too far
    cols = np.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]], np.float32)
    p = str(tmp_path / "c.ply")
    write_ply(p, pts, cols)
    cam2base = np.eye(4)
    cam2base[:3, 3] = [1.0, 0, 0]
    s = load_rgb_pcd(p, cam2base)
    assert s.points.shape == (1, 3)
    np.testing.assert_allclose(s.points[0], [1.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(s.colors[0], [1.0, 1.0, 1.0], atol=1e-2)


def test_pad_point_cloud():
    s = PointCloudSample(np.ones((10, 3), np.float32), np.zeros((10, 3), np.float32))
    pts, cols, valid = pad_point_cloud(s, 16)
    assert pts.shape == (16, 3) and valid.sum() == 10
    pts2, _, valid2 = pad_point_cloud(s, 4)
    assert pts2.shape == (4, 3) and valid2.all()


def test_synthetic_scene_and_demo():
    scene = make_synthetic_scene(seed=1, n_points=5000)
    assert scene.points.shape == (np.shape(scene.colors)[0], 3)
    assert (scene.colors >= -1).all() and (scene.colors <= 1).all()
    demo = make_synthetic_demo(scene, seed=1)
    assert demo.num_keyframes == 5
    # grasp closes the gripper partway through
    assert demo.gripper_open[0] == 1 and demo.gripper_open[-1] == 0


def test_calibration_chain_and_io(tmp_path):
    from real_robot_nerf_actor_tpu.data.calibration import (
        compose_cam2base, gl_to_cv, load_calibration, save_calibration)
    rng = np.random.default_rng(0)
    # a plausible desk2camera with orthonormal rotation
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    d2c = np.eye(4)
    d2c[:3, :3] = q
    d2c[:3, 3] = [0.1, 0.2, 0.7]
    adj_o = np.diag([1.0, -1, -1, 1])
    adj_p = np.eye(4)
    adj_p[:3, 3] = [-0.08, 0.16, 0.01]
    c2b = compose_cam2base(d2c, adj_o, adj_p)
    # inverse chain recovers identity (up to gl2cv)
    recon = (d2c @ adj_o @ adj_p) @ c2b
    np.testing.assert_allclose(recon, gl_to_cv(), atol=1e-9)
    p = str(tmp_path / "calib.json")
    save_calibration(p, c2b, note=[1, 2])
    np.testing.assert_allclose(load_calibration(p), c2b)


def test_heightmap():
    from real_robot_nerf_actor_tpu.data.calibration import get_heightmap
    pts = np.array([[0.05, 0.05, 0.1], [0.05, 0.05, 0.3],  # same cell, z-max
                    [0.15, 0.05, 0.2], [0.9, 0.9, 0.5]], np.float32)  # last OOB
    cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32)
    hm, cm = get_heightmap(pts, cols, np.array([[0, 0, 0], [0.2, 0.2, 1.0]]),
                           pixel_size=0.1)
    assert hm.shape == (2, 2)
    assert abs(hm[0, 0] - 0.3) < 1e-6       # max height wins
    np.testing.assert_allclose(cm[0, 0], [0, 1, 0])  # its color too
    assert hm[1, 1] == 0.0                   # OOB point excluded
