"""Native C++ PLY loader / prefetcher tests (vs the Python reader)."""
import numpy as np
import pytest

from real_robot_nerf_actor_tpu.data.native_loader import (
    NativePrefetcher, native_available, read_ply_native)
from real_robot_nerf_actor_tpu.data.ply import read_ply, write_ply
from real_robot_nerf_actor_tpu.data.replay import load_rgb_pcd

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


def _make_ply(tmp_path, n=5000, binary=True, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    p = str(tmp_path / f"t{'b' if binary else 'a'}{seed}.ply")
    write_ply(p, pts, cols, binary=binary)
    return p, pts, cols


@pytest.mark.parametrize("binary", [True, False])
def test_native_matches_python_reader(tmp_path, binary):
    p, pts, cols = _make_ply(tmp_path, binary=binary)
    np_pts, np_cols = read_ply(p)
    na_pts, na_cols = read_ply_native(p)
    np.testing.assert_allclose(na_pts, np_pts, atol=1e-5)
    np.testing.assert_allclose(na_cols, np_cols, atol=1 / 254.0)


def test_prefetcher_fifo_and_transform(tmp_path):
    paths = []
    for s in range(4):
        p, pts, _ = _make_ply(tmp_path, n=1000, seed=s)
        paths.append((p, pts))
    cam2base = np.eye(4)
    cam2base[:3, 3] = [2.0, 0, 0]

    pf = NativePrefetcher(max_num_coords=1500, n_workers=2, capacity=4)
    for p, _ in paths:
        pf.submit(p, cam2base)
    for p, pts in paths:  # FIFO order must hold
        xyz, rgb, valid = pf.next()
        assert valid.sum() == 1000
        np.testing.assert_allclose(xyz[:1000], pts + [2.0, 0, 0], atol=1e-5)
        assert (np.abs(rgb[:1000]) <= 1.0 + 1e-5).all()  # normalized to [-1,1]
    pf.close()


def test_prefetcher_matches_replay_loader(tmp_path):
    """Native path == data.replay.load_rgb_pcd + pad_point_cloud."""
    rng = np.random.default_rng(7)
    pts = np.concatenate([rng.uniform(-1, 1, (800, 3)),
                          rng.uniform(4, 5, (200, 3))]).astype(np.float32)
    cols = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
    p = str(tmp_path / "far.ply")
    write_ply(p, pts, cols)
    cam2base = np.eye(4)

    ref = load_rgb_pcd(p, cam2base)
    pf = NativePrefetcher(max_num_coords=1200, n_workers=1)
    pf.submit(p, cam2base)
    xyz, rgb, valid = pf.next()
    pf.close()
    assert valid.sum() == ref.points.shape[0] == 800
    got = xyz[valid[: 1000].nonzero()[0]] if False else xyz[valid.nonzero()[0]]
    # native keeps original slot order with holes; compare as sets via sort
    np.testing.assert_allclose(np.sort(got, axis=0),
                               np.sort(ref.points, axis=0), atol=1e-5)
