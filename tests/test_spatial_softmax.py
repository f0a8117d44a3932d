"""SpatialSoftmax3D parity vs an independent torch implementation of
network_utils.py:977-1015."""
import numpy as np
import jax.numpy as jnp
import pytest

from real_robot_nerf_actor_tpu.ops import spatial_softmax_3d

torch = pytest.importorskip("torch")


def torch_spatial_softmax(feature_ncdhw, temperature=0.01):
    t = torch.as_tensor(feature_ncdhw, dtype=torch.float64)
    b, c, d, h, w = t.shape
    px, py, pz = np.meshgrid(np.linspace(-1, 1, d), np.linspace(-1, 1, h),
                             np.linspace(-1, 1, w))
    px = torch.as_tensor(px.reshape(-1), dtype=torch.float64)
    py = torch.as_tensor(py.reshape(-1), dtype=torch.float64)
    pz = torch.as_tensor(pz.reshape(-1), dtype=torch.float64)
    flat = t.reshape(-1, d * h * w)
    att = torch.softmax(flat / temperature, dim=-1)
    ex = (px * att).sum(1, keepdim=True)
    ey = (py * att).sum(1, keepdim=True)
    ez = (pz * att).sum(1, keepdim=True)
    return torch.cat([ex, ey, ez], 1).reshape(b, c * 3).numpy()


def test_spatial_softmax_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 6, 6, 6)).astype(np.float32) * 0.1
    want = torch_spatial_softmax(x)
    got = spatial_softmax_3d(jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_pallas_stats_kernel_matches_xla():
    """spatial_softmax_3d_pallas (interpret mode) == the XLA path."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu
    from real_robot_nerf_actor_tpu.ops.stats_pallas import (
        spatial_softmax_3d_pallas)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8, 6)) * 0.3, jnp.float32)
    want = spatial_softmax_3d(x)
    with pltpu.force_tpu_interpret_mode():
        got = spatial_softmax_3d_pallas(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
