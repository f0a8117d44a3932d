"""RealSense-style depth filter pipeline (data/depth_filters.py).

Reference: read_real_data_kitchen.py:55-115 — depth->disparity ->
spatial(5, 0.75, 1, holes_fill=1) -> temporal -> depth -> clip(1 m).
"""
import numpy as np

from real_robot_nerf_actor_tpu.data.depth_filters import (
    DepthFilterPipeline, SpatialFilterConfig, TemporalFilterConfig,
    depth_to_disparity, depth_to_pointcloud, disparity_to_depth,
    spatial_filter, temporal_filter)


def test_disparity_transform_involution():
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.3, 2.0, (16, 24)).astype(np.float32)
    depth[2, 3] = 0.0   # invalid stays invalid through the round trip
    d = depth_to_disparity(depth, k=2.0)
    back = disparity_to_depth(d, k=2.0)
    np.testing.assert_allclose(back, depth, rtol=1e-6)
    assert d[2, 3] == 0.0 and back[2, 3] == 0.0


def test_spatial_filter_smooths_but_preserves_edges():
    rng = np.random.default_rng(1)
    # two flat surfaces with a big disparity step between them + noise
    disp = np.full((32, 64), 5.0, np.float32)
    disp[:, 32:] = 20.0
    noisy = disp + rng.normal(0, 0.2, disp.shape).astype(np.float32)
    out = spatial_filter(noisy, SpatialFilterConfig(
        magnitude=3, smooth_alpha=0.75, smooth_delta=1.0, holes_fill=0))
    # noise shrinks on each surface
    assert out[:, 5:27].std() < noisy[:, 5:27].std() * 0.6
    assert out[:, 37:59].std() < noisy[:, 37:59].std() * 0.6
    # the edge step survives (no smearing across the delta threshold)
    assert abs(out[:, 33].mean() - 20.0) < 1.0
    assert abs(out[:, 30].mean() - 5.0) < 1.0


def test_spatial_filter_fills_small_holes_only():
    disp = np.full((8, 32), 10.0, np.float32)
    disp[:, 10] = 0.0          # 1-wide hole: filled at holes_fill=1
    disp[:, 20:24] = 0.0       # 4-wide hole: not filled at r=1
    out = spatial_filter(disp, SpatialFilterConfig(
        magnitude=1, smooth_alpha=0.75, smooth_delta=1.0, holes_fill=1))
    assert (out[:, 10] > 0).all()
    assert (out[:, 22] == 0).any() or (out[:, 21] == 0).any()


def test_temporal_filter_ema_and_persistence():
    cfg = TemporalFilterConfig(smooth_alpha=0.5, smooth_delta=5.0,
                               persistence=2)
    f0 = np.full((4, 4), 10.0, np.float32)
    out0, st = temporal_filter(f0, None, cfg)
    np.testing.assert_array_equal(out0, f0)
    # small change -> EMA
    f1 = np.full((4, 4), 12.0, np.float32)
    out1, st = temporal_filter(f1, st, cfg)
    np.testing.assert_allclose(out1, 11.0)
    # big change -> reset, no smearing across motion
    f2 = np.full((4, 4), 40.0, np.float32)
    out2, st = temporal_filter(f2, st, cfg)
    np.testing.assert_allclose(out2, 40.0)
    # hole persists for `persistence` frames, then dies
    hole = np.zeros((4, 4), np.float32)
    out3, st = temporal_filter(hole, st, cfg)
    np.testing.assert_allclose(out3, 40.0)     # persisted
    out4, st = temporal_filter(hole, st, cfg)
    np.testing.assert_allclose(out4, 40.0)     # persisted (age 2)
    out5, st = temporal_filter(hole, st, cfg)
    np.testing.assert_allclose(out5, 0.0)      # expired


def test_pipeline_clips_and_denoises():
    rng = np.random.default_rng(2)
    depth = np.full((24, 24), 0.6, np.float32)
    depth += rng.normal(0, 0.01, depth.shape).astype(np.float32)
    depth[0, 0] = 1.7          # beyond the 1 m clipping distance
    pipe = DepthFilterPipeline()
    out = pipe(depth)
    assert out[0, 0] == 0.0                     # clipped
    inner = out[4:20, 4:20]
    assert inner.std() < depth[4:20, 4:20].std()
    assert abs(inner.mean() - 0.6) < 0.02


def test_depth_to_pointcloud_matches_reference_math():
    k = np.array([[100.0, 0, 11.5], [0, 100.0, 7.5], [0, 0, 1]])
    depth = np.full((16, 24), 2.0, np.float32)
    pts = depth_to_pointcloud(depth, k)
    assert pts.shape == (16, 24, 3)
    # center pixel maps to the optical axis
    np.testing.assert_allclose(pts[8, 12, :2],
                               [(12 - 11.5) * 2 / 100, (8 - 7.5) * 2 / 100])
    np.testing.assert_allclose(pts[..., 2], 2.0)
    # a pixel left of center has negative x
    assert pts[8, 2, 0] < 0
