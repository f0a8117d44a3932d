"""Trilinear grid-sample parity vs torch.nn.functional.grid_sample
(align_corners=True, zeros padding) — the exact call used by the reference
at models_embed.py:275."""
import numpy as np
import jax.numpy as jnp
import pytest

from real_robot_nerf_actor_tpu.ops import grid_sample_3d, sample_in_canonical_voxel

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("seed", [0, 1])
def test_grid_sample_matches_torch(seed):
    rng = np.random.default_rng(seed)
    b, d, h, w, c = 2, 7, 6, 5, 4
    n = 200
    grid = rng.standard_normal((b, c, d, h, w)).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, size=(b, n, 3)).astype(np.float32)  # incl. out of range

    want = F.grid_sample(
        torch.as_tensor(grid),
        torch.as_tensor(coords)[:, None, None],  # (B,1,1,N,3)
        align_corners=True, mode="bilinear", padding_mode="zeros",
    ).squeeze(2).squeeze(2).permute(0, 2, 1).numpy()  # (B,N,C)

    got = grid_sample_3d(jnp.asarray(grid.transpose(0, 2, 3, 4, 1)), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_sample_in_canonical_voxel():
    rng = np.random.default_rng(2)
    b, v, c, n = 1, 10, 8, 64
    vox = rng.standard_normal((b, c, v, v, v)).astype(np.float32)
    canon = rng.uniform(0, 1, size=(b, n, 3)).astype(np.float32)

    coords = canon * 2 - 1
    want = F.grid_sample(
        torch.as_tensor(vox), torch.as_tensor(coords)[:, None, None],
        align_corners=True, mode="bilinear",
    ).squeeze(2).squeeze(2).permute(0, 2, 1).numpy()

    got = sample_in_canonical_voxel(jnp.asarray(vox.transpose(0, 2, 3, 4, 1)),
                                    jnp.asarray(canon))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_fused_corner_gather_matches_multi():
    """expand_corners + single-gather path == 8-gather path (exact)."""
    from real_robot_nerf_actor_tpu.ops.grid_sample import (
        expand_corners, grid_sample_3d_fused)
    rng = np.random.default_rng(5)
    b, d, h, w, c = 2, 6, 5, 7, 4
    grid = jnp.asarray(rng.standard_normal((b, d, h, w, c)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (b, 300, 3)), jnp.float32)
    want = grid_sample_3d(grid, coords)
    exp = expand_corners(grid)
    assert exp.shape == (b, d + 1, h + 1, w + 1, 8 * c)
    got = grid_sample_3d_fused(exp, coords, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pallas_lerp_backend_matches_xla():
    """FUSED_LERP_BACKEND='pallas' (interpret off-TPU) == nested XLA lerp,
    including out-of-range corner masking (fp32 accumulation tolerance)."""
    from real_robot_nerf_actor_tpu.ops import grid_sample as gs
    rng = np.random.default_rng(7)
    b, d, h, w, c = 2, 6, 5, 7, 4
    grid = jnp.asarray(rng.standard_normal((b, d, h, w, c)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (b, 300, 3)), jnp.float32)
    exp = gs.expand_corners(grid)
    want = gs.grid_sample_3d_fused(exp, coords, c)
    try:
        gs.FUSED_LERP_BACKEND = "pallas"
        got = gs.grid_sample_3d_fused(exp, coords, c)
    finally:
        gs.FUSED_LERP_BACKEND = "xla"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_corner_lerp_vjp_matches_xla_formulation():
    """corner_lerp's custom VJP == autodiff of the straightforward math."""
    import jax
    from real_robot_nerf_actor_tpu.ops.lerp_pallas import corner_lerp, _lerp_xla
    rng = np.random.default_rng(8)
    rows = jnp.asarray(rng.standard_normal((40, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 40)), jnp.float32)

    g = jnp.asarray(rng.standard_normal((40, 4)), jnp.float32)
    out, vjp = jax.vjp(corner_lerp, rows, w)
    want_out, want_vjp = jax.vjp(lambda r, wt: _lerp_xla(r, wt.T), rows, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               rtol=1e-5, atol=1e-5)
    for a, b2 in zip(vjp(g), want_vjp(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-5, atol=1e-5)


def test_resnetfc_tuple_input_matches_concat():
    import jax
    from real_robot_nerf_actor_tpu.models.resnetfc import ResnetFC
    mlp = ResnetFC(d_out=4, n_blocks=3, d_latent=8, d_hidden=16,
                   combine_layer=2)
    rng = np.random.default_rng(9)
    z = jnp.asarray(rng.standard_normal((20, 8)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((20, 5)), jnp.float32)
    zx = jnp.concatenate([z, x], axis=-1)
    params = mlp.init(jax.random.key(0), zx)
    a, _ = mlp.apply(params, zx)
    b2, _ = mlp.apply(params, (z, x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                               rtol=1e-6, atol=1e-6)


def test_fastbwd_grid_gradient_matches_native_autodiff():
    """grid_sample_3d_fastbwd: forward identical; d(grid) == native
    autodiff of the 8-gather path (one-scatter backward is exact)."""
    import jax
    from real_robot_nerf_actor_tpu.ops.grid_sample import (
        grid_sample_3d, grid_sample_3d_fastbwd)
    rng = np.random.default_rng(11)
    b, d, h, w, c = 2, 5, 6, 7, 4
    grid = jnp.asarray(rng.standard_normal((b, d, h, w, c)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-1.3, 1.3, (b, 200, 3)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, 200, c)), jnp.float32)

    out_a, vjp_a = jax.vjp(lambda g: grid_sample_3d(g, coords), grid)
    out_b, vjp_b = jax.vjp(lambda g: grid_sample_3d_fastbwd(g, coords), grid)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vjp_a(cot)[0]),
                               np.asarray(vjp_b(cot)[0]),
                               rtol=1e-4, atol=1e-5)
