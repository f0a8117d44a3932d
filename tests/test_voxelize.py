"""Voxelizer unit tests: golden parity against an independent torch
scatter-mean implementation of the reference semantics
(voxel_grid_real.py:175-233)."""
import numpy as np
import jax.numpy as jnp
import pytest

from real_robot_nerf_actor_tpu.ops import VoxelizerSpec, voxelize

torch = pytest.importorskip("torch")


def torch_reference_voxelize(coords, feats, bounds, v):
    """Independent torch implementation of the reference scatter-mean voxel
    grid (same math, different code): returns (V,V,V, 7+F) channel-last."""
    coords = torch.as_tensor(coords, dtype=torch.float64)
    feats = torch.as_tensor(feats, dtype=torch.float64)
    bounds = torch.as_tensor(bounds, dtype=torch.float64)
    vp = v + 2
    bb_min, bb_max = bounds[:3], bounds[3:]
    res = (bb_max - bb_min) / (v + 1e-12)
    shifted = bb_min - res
    idx = torch.floor((coords - shifted) / (res + 1e-12)).long()
    idx = idx.clamp(0, vp - 1)
    flat = (idx[:, 0] * vp + idx[:, 1]) * vp + idx[:, 2]
    vals = torch.cat([coords, feats, torch.ones(coords.shape[0], 1, dtype=torch.float64)], -1)
    c = vals.shape[-1]
    sums = torch.zeros(vp ** 3, c, dtype=torch.float64)
    sums.index_add_(0, flat, vals)
    counts = torch.zeros(vp ** 3, dtype=torch.float64)
    counts.index_add_(0, flat, torch.ones_like(flat, dtype=torch.float64))
    counts = counts.clamp(min=1.0)
    grid = (sums / counts[:, None]).reshape(vp, vp, vp, c)
    vox = grid[1:-1, 1:-1, 1:-1]
    occ = (vox[..., -1:] > 0).double()
    ar = torch.arange(v, dtype=torch.float64)
    gx, gy, gz = torch.meshgrid(ar, ar, ar, indexing="ij")
    idxg = torch.stack([gx, gy, gz], -1) / v
    return torch.cat([vox[..., :-1], idxg, occ], -1).numpy()


def test_voxelize_matches_reference_semantics():
    rng = np.random.default_rng(0)
    n, v = 5000, 20
    bounds = np.array([-0.1, -0.3, -0.2, 0.8, 0.7, 0.7], np.float32)
    coords = rng.uniform(-0.4, 1.0, size=(n, 3)).astype(np.float32)  # some out of bounds
    feats = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)

    got = voxelize(jnp.asarray(coords)[None], jnp.asarray(feats)[None],
                   jnp.asarray(bounds), VoxelizerSpec(voxel_size=v, feature_size=3,
                                                      max_num_coords=n))
    want = torch_reference_voxelize(coords, feats, bounds, v)
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-4, atol=1e-5)


def test_voxelize_padding_mask_is_inert():
    rng = np.random.default_rng(1)
    v, n_real, n_pad = 16, 1000, 500
    bounds = np.array([0, 0, 0, 1, 1, 1], np.float32)
    coords = rng.uniform(0, 1, size=(n_real, 3)).astype(np.float32)
    feats = rng.uniform(-1, 1, size=(n_real, 3)).astype(np.float32)
    spec = VoxelizerSpec(voxel_size=v, feature_size=3, max_num_coords=n_real + n_pad)

    base = voxelize(jnp.asarray(coords)[None], jnp.asarray(feats)[None],
                    jnp.asarray(bounds), VoxelizerSpec(voxel_size=v, feature_size=3,
                                                       max_num_coords=n_real))
    coords_p = np.concatenate([coords, rng.uniform(0, 1, (n_pad, 3)).astype(np.float32)])
    feats_p = np.concatenate([feats, np.ones((n_pad, 3), np.float32) * 7])
    valid = np.concatenate([np.ones(n_real, bool), np.zeros(n_pad, bool)])
    padded = voxelize(jnp.asarray(coords_p)[None], jnp.asarray(feats_p)[None],
                      jnp.asarray(bounds), spec, valid=jnp.asarray(valid)[None])
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base), rtol=1e-5, atol=1e-6)


def test_voxelize_channels():
    v = 8
    bounds = jnp.array([0., 0., 0., 1., 1., 1.])
    coords = jnp.array([[[0.51, 0.51, 0.51]]])  # single point mid-grid
    feats = jnp.array([[[0.2, -0.4, 0.6]]])
    out = voxelize(coords, feats, bounds, VoxelizerSpec(v, 3, 1))
    assert out.shape == (1, v, v, v, 10)
    occ = np.asarray(out[0, ..., -1])
    assert occ.sum() == 1.0
    iz = np.argwhere(occ > 0)[0]
    np.testing.assert_allclose(np.asarray(out[0, iz[0], iz[1], iz[2], :3]),
                               [0.51, 0.51, 0.51], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, iz[0], iz[1], iz[2], 3:6]),
                               [0.2, -0.4, 0.6], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, iz[0], iz[1], iz[2], 6:9]),
                               iz / v, atol=1e-6)
