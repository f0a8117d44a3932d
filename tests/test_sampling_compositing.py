"""Samplers + alpha compositing tests (neural_rendering.py:159-396 math)."""
import numpy as np
import jax
import jax.numpy as jnp

from real_robot_nerf_actor_tpu.ops import (
    sample_coarse, sample_fine, sample_fine_depth, composite)


def _rays(b, near=1.2, far=4.0):
    rng = np.random.default_rng(0)
    o = rng.standard_normal((b, 3)).astype(np.float32)
    d = rng.standard_normal((b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nf = np.broadcast_to([near, far], (b, 2)).astype(np.float32)
    return jnp.asarray(np.concatenate([o, d, nf], -1))


def test_sample_coarse_stratified():
    rays = _rays(64)
    z = np.asarray(sample_coarse(jax.random.key(0), rays, 64))
    assert z.shape == (64, 64)
    assert (z >= 1.2).all() and (z <= 4.0).all()
    # strictly increasing per ray (strata are disjoint)
    assert (np.diff(z, axis=-1) > 0).all()
    # bin k sample lies in [near + k*step_range, near + (k+1)*step_range]
    edges = 1.2 + (4.0 - 1.2) * np.arange(65) / 64
    assert (z >= edges[:-1][None] - 1e-5).all() and (z <= edges[1:][None] + 1e-5).all()


def test_sample_fine_follows_weights():
    rays = _rays(16)
    w = np.zeros((16, 64), np.float32)
    w[:, 30] = 1.0  # all mass in stratum 30
    z = np.asarray(sample_fine(jax.random.key(1), rays, jnp.asarray(w), 16, 64))
    assert z.shape == (16, 16)
    # nearly all samples must land in stratum 30 (tiny 1e-5 leakage allowed)
    edges = 1.2 + (4.0 - 1.2) * np.arange(65) / 64
    frac = ((z >= edges[30] - 1e-3) & (z <= edges[31] + 1e-3)).mean()
    assert frac > 0.95


def test_sample_fine_depth_clamped():
    rays = _rays(8)
    depth = jnp.full((8,), 3.99)
    z = np.asarray(sample_fine_depth(jax.random.key(2), rays, depth, 16, depth_std=0.1))
    assert (z <= 4.0).all() and (z >= 1.2).all()


def test_composite_golden_simple():
    """Two samples with hand-computable alphas."""
    rays = jnp.asarray([[0, 0, 0, 0, 0, -1, 0.0, 3.0]], jnp.float32)
    z = jnp.asarray([[1.0, 2.0]])
    sigmas = jnp.asarray([[1.0, 2.0]])
    rgbs = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    embeds = jnp.asarray([[[2.0], [4.0]]])
    out = composite(z, rays, rgbs, sigmas, embeds)
    # deltas = [1.0, far - 2.0 = 1.0]
    a1 = 1 - np.exp(-1.0)
    a2 = 1 - np.exp(-2.0)
    t2 = (1 - a1 + 1e-10)
    w = np.array([a1, a2 * t2])
    np.testing.assert_allclose(np.asarray(out.weights[0]), w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.rgb[0]), [w[0], w[1], 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth[0]), w[0] * 1 + w[1] * 2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.embed[0]), [2 * w[0] + 4 * w[1]], rtol=1e-5)


def test_composite_opaque_ray():
    """A very dense sample should terminate the ray (weights sum ~= 1)."""
    rays = _rays(4)
    z = jnp.broadcast_to(jnp.linspace(1.2, 4.0, 32), (4, 32))
    sigmas = jnp.full((4, 32), 100.0)
    rgbs = jnp.ones((4, 32, 3)) * 0.5
    out = composite(z, rays, rgbs, sigmas, jnp.zeros((4, 32, 1)))
    np.testing.assert_allclose(np.asarray(out.weights.sum(-1)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.rgb), 0.5, atol=1e-4)


def test_composite_white_bkgd():
    rays = _rays(2)
    z = jnp.broadcast_to(jnp.linspace(1.2, 4.0, 8), (2, 8))
    out = composite(z, rays, jnp.zeros((2, 8, 3)), jnp.zeros((2, 8)),
                    jnp.zeros((2, 8, 1)), white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-5)


def test_se3_aug_consistency():
    from real_robot_nerf_actor_tpu.ops import apply_se3_augmentation
    bounds = jnp.asarray([-0.1, -0.3, -0.2, 0.8, 0.7, 0.7])
    pcd = jax.random.uniform(jax.random.key(0), (1, 500, 3)) * 0.5
    kf = jnp.asarray([[0.3, 0.2, 0.1], [0.5, 0.4, 0.3]])
    out = apply_se3_augmentation(jax.random.key(3), pcd, kf, bounds,
                                 jnp.asarray([0.125, 0.05, 0.05]), 100)
    # pcd is rigidly shifted
    np.testing.assert_allclose(np.asarray(out.pcd - pcd)[0],
                               np.broadcast_to(np.asarray(out.shift), (500, 3)), atol=1e-6)
    # actions stay in bounds after discretization
    assert (np.asarray(out.action_trans) >= 0).all()
    assert (np.asarray(out.action_trans) <= 99).all()
    # and match re-discretizing the shifted keyframes
    from real_robot_nerf_actor_tpu.ops.geometry import point_to_voxel_index
    want = point_to_voxel_index(kf + out.shift[None], 100, bounds)
    np.testing.assert_array_equal(np.asarray(out.action_trans), np.asarray(want))


def test_se3_aug_symmetric_clamp_is_zero_mean_near_bounds():
    """A keyframe near a workspace bound must not skew the shift marginal.

    Round-4 forensics: the one-sided clip biased the free-space retreat
    keyframe's label marginal toward the interior and the decoder tracked
    that bias (consistent 2-5 voxel misses). The symmetric clamp keeps the
    applied shift zero-mean per axis at the cost of a narrower window.
    """
    from real_robot_nerf_actor_tpu.ops import apply_se3_augmentation
    bounds = jnp.asarray([-0.1, -0.3, -0.2, 0.8, 0.7, 0.7])
    pcd = jax.random.uniform(jax.random.key(0), (1, 64, 3)) * 0.5
    # z = 0.65 sits 0.05 below the z upper bound; x/y interior
    kf = jnp.asarray([[0.3, 0.2, 0.65]])
    rng_range = jnp.asarray([0.125, 0.125, 0.125])  # 0.1125 m in z > 0.05

    keys = jax.random.split(jax.random.key(7), 512)
    sym = jnp.stack([apply_se3_augmentation(
        k, pcd, kf, bounds, rng_range, 100).shift for k in keys])
    one_sided = jnp.stack([apply_se3_augmentation(
        k, pcd, kf, bounds, rng_range, 100, symmetric_clamp=False).shift
        for k in keys])

    # symmetric: z support is clipped to +-(0.7 - 0.65 - eps) and zero-mean
    z = np.asarray(sym[:, 2])
    assert abs(z.mean()) < 0.005
    assert z.max() <= 0.05 + 1e-6 and z.min() >= -0.05 - 1e-6
    # unclamped interior axes keep the full range under both modes
    np.testing.assert_allclose(np.asarray(sym[:, 0]),
                               np.asarray(one_sided[:, 0]), atol=1e-7)
    # one-sided: mass piles at the upper clamp -> negative mean
    z1 = np.asarray(one_sided[:, 2])
    assert z1.mean() < -0.01
    # keyframes stay in bounds in both modes
    for out in (sym, one_sided):
        shifted = np.asarray(kf)[None] + np.asarray(out)[:, None]
        assert (shifted <= np.asarray(bounds[3:6])[None, None]).all()
        assert (shifted >= np.asarray(bounds[0:3])[None, None]).all()


def test_composite_unsorted_matches_sorted():
    from real_robot_nerf_actor_tpu.ops.compositing import composite_unsorted
    rng = np.random.default_rng(3)
    b, k = 8, 12
    rays = _rays(b)
    z = jnp.asarray(rng.uniform(1.2, 4.0, (b, k)), jnp.float32)
    rgbs = jnp.asarray(rng.uniform(0, 1, (b, k, 3)), jnp.float32)
    sig = jnp.asarray(rng.exponential(1.0, (b, k)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((b, k, 5)), jnp.float32)

    order = jnp.argsort(z, axis=-1)
    zs = jnp.take_along_axis(z, order, -1)
    sorted_out = composite(zs, rays,
                           jnp.take_along_axis(rgbs, order[..., None], -2),
                           jnp.take_along_axis(sig, order, -1),
                           jnp.take_along_axis(emb, order[..., None], -2))
    unsorted_out = composite_unsorted(z, rays, rgbs, sig, emb)
    np.testing.assert_allclose(np.asarray(unsorted_out.rgb),
                               np.asarray(sorted_out.rgb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(unsorted_out.depth),
                               np.asarray(sorted_out.depth), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(unsorted_out.embed),
                               np.asarray(sorted_out.embed), rtol=1e-4, atol=1e-5)


def test_render_reuse_coarse_matches_reeval():
    """reuse_coarse fine pass == reference-style full re-evaluation."""
    import dataclasses
    import jax
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig
    base = RendererConfig(n_coarse=6, n_fine=4, n_fine_depth=2,
                          fused_gather=False,
                          field=NerfFieldConfig(
                              d_latent=4, d_embed=4, d_hidden=16, n_blocks=2,
                              combine_layer=1,
                              coord_bounds=(-1., -1., -1., 1., 1., 1.)))
    r1 = NeuralRenderer(dataclasses.replace(base, reuse_coarse=True))
    r2 = NeuralRenderer(dataclasses.replace(base, reuse_coarse=False))
    params = r1.init_params(jax.random.key(0))
    vox = jax.random.normal(jax.random.key(1), (1, 4, 4, 4, 4))
    rays = jnp.concatenate([
        jnp.zeros((10, 3)), jnp.tile(jnp.asarray([[0., 0., -1.]]), (10, 1)),
        jnp.full((10, 1), 0.5), jnp.full((10, 1), 2.0)], -1)
    key = jax.random.key(2)
    o1 = r1.render_rays(params, vox, rays, key)
    o2 = r2.render_rays(params, vox, rays, key)
    np.testing.assert_allclose(np.asarray(o1["fine"].rgb),
                               np.asarray(o2["fine"].rgb), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1["fine"].depth),
                               np.asarray(o2["fine"].depth), rtol=1e-4,
                               atol=1e-5)


def test_late_embed_matches_per_sample():
    """late_embed (composite hidden, project once per ray) must equal the
    per-sample embed path exactly (same params; the embed head is linear)."""
    import dataclasses
    import jax
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig
    base = RendererConfig(n_coarse=6, n_fine=4, n_fine_depth=2,
                          fused_gather=False,
                          field=NerfFieldConfig(
                              d_latent=4, d_embed=8, d_hidden=16, n_blocks=2,
                              combine_layer=1,
                              coord_bounds=(-1., -1., -1., 1., 1., 1.)))
    rngs = np.random.default_rng(7)
    rays = jnp.concatenate([
        jnp.asarray(rngs.standard_normal((12, 3)) * 0.1, jnp.float32),
        jnp.tile(jnp.asarray([[0., 0., -1.]]), (12, 1)),
        jnp.full((12, 1), 0.5), jnp.full((12, 1), 2.0)], -1)
    key = jax.random.key(2)
    outs = {}
    for late in (False, True):
        for reuse in (False, True):
            r = NeuralRenderer(dataclasses.replace(
                base, late_embed=late, reuse_coarse=reuse))
            params = r.init_params(jax.random.key(0))
            vox = jax.random.normal(jax.random.key(1), (1, 4, 4, 4, 4))
            outs[(late, reuse)] = r.render_rays(params, vox, rays, key)
    for reuse in (False, True):
        a, b = outs[(True, reuse)], outs[(False, reuse)]
        for lvl in ("coarse", "fine"):
            np.testing.assert_allclose(
                np.asarray(a[lvl].embed), np.asarray(b[lvl].embed),
                rtol=1e-4, atol=1e-5, err_msg=f"{lvl} reuse={reuse}")
            np.testing.assert_allclose(
                np.asarray(a[lvl].rgb), np.asarray(b[lvl].rgb),
                rtol=1e-5, atol=1e-6)


def test_compositing_grads_finite_at_saturation():
    """Gradient regression for the round-3 flagship NaN (step 3547): with
    optical depth x = delta * relu(sigma) > ~17.3, fp32 rounds alpha to
    exactly 1.0 and the old cumprod/log(1 - alpha + 1e-10) backward blew
    up (~300x amplification; NaN in the fused TPU backward at x = 18.9).
    The exact log-space form (log T = -cumsum x) must stay finite AND
    match the true analytic gradient for arbitrarily saturated sigmas."""
    from real_robot_nerf_actor_tpu.ops.compositing import (
        compute_weights, compute_weights_unsorted, composite_unsorted)
    b, k = 4, 16
    rays = _rays(b)
    rng = np.random.default_rng(0)
    z = jnp.sort(jnp.asarray(rng.uniform(1.2, 4.0, (b, k)), jnp.float32), -1)
    # saturated densities: x = delta * sigma spans the fp32 alpha==1 cliff
    sig = jnp.asarray(rng.uniform(0.0, 3000.0, (b, k)), jnp.float32)

    for fn in (lambda s: jnp.sum(compute_weights(z, s, rays) * z),
               lambda s: jnp.sum(compute_weights_unsorted(z, s, rays) * z)):
        g = jax.grad(fn)(sig)
        assert bool(jnp.isfinite(g).all()), fn
        # analytic check on one coordinate via fp64 central difference
        i, j = 1, 5
        eps = 1e-3
        gp = fn(sig.at[i, j].add(eps))
        gm = fn(sig.at[i, j].add(-eps))
        fd = (float(gp) - float(gm)) / (2 * eps)
        np.testing.assert_allclose(float(g[i, j]), fd, rtol=5e-2, atol=1e-5)

    # full composite backward (the training path) also finite
    rgbs = jnp.asarray(rng.uniform(0, 1, (b, k, 3)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((b, k, 4)), jnp.float32)

    def loss(s):
        out = composite_unsorted(z, rays, rgbs, s, emb)
        return (jnp.sum(out.rgb ** 2) + jnp.sum(out.depth ** 2)
                + jnp.sum(out.embed ** 2))

    g = jax.grad(loss)(sig)
    assert bool(jnp.isfinite(g).all())
