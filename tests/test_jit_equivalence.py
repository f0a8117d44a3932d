"""jit-vs-eager equivalence (SURVEY.md test pyramid tier 2) + augmentation
tests + grad accumulation."""
import numpy as np
import jax
import jax.numpy as jnp

from real_robot_nerf_actor_tpu.ops import (
    VoxelizerSpec, composite, gen_rays, sample_coarse, voxelize)


def test_voxelize_jit_equals_eager():
    rng = np.random.default_rng(0)
    spec = VoxelizerSpec(voxel_size=12, feature_size=3, max_num_coords=800)
    coords = jnp.asarray(rng.uniform(0, 1, (1, 800, 3)), jnp.float32)
    feats = jnp.asarray(rng.uniform(-1, 1, (1, 800, 3)), jnp.float32)
    bounds = jnp.asarray([0, 0, 0, 1, 1, 1.0])
    with jax.disable_jit():
        eager = voxelize(coords, feats, bounds, spec)
    jitted = voxelize(coords, feats, bounds, spec)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                               rtol=1e-5, atol=1e-6)


def test_render_rays_jit_equals_eager():
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig
    cfg = RendererConfig(n_coarse=4, n_fine=2, n_fine_depth=0,
                         field=NerfFieldConfig(
                             d_latent=4, d_embed=4, d_hidden=8, n_blocks=2,
                             combine_layer=1,
                             coord_bounds=(-1., -1., -1., 1., 1., 1.)))
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    vox = jax.random.normal(jax.random.key(1), (1, 4, 4, 4, 4))
    rays = np.concatenate([np.zeros((16, 3)), np.tile([[0, 0, -1.]], (16, 1)),
                           np.full((16, 1), 0.5), np.full((16, 1), 2.0)],
                          -1).astype(np.float32)
    key = jax.random.key(2)
    with jax.disable_jit():
        eager = r.render_rays(params, vox, jnp.asarray(rays), key)
    jf = jax.jit(lambda p, v, rr: r.render_rays(p, v, rr, key))
    jitted = jf(params, vox, jnp.asarray(rays))
    np.testing.assert_allclose(np.asarray(jitted["fine"].rgb),
                               np.asarray(eager["fine"].rgb),
                               rtol=1e-4, atol=1e-5)


def test_augmentations():
    from real_robot_nerf_actor_tpu.data.augment import (
        color_jitter, random_grayscale, random_shift)
    imgs = jax.random.uniform(jax.random.key(0), (4, 16, 16, 3))
    out = random_shift(jax.random.key(1), imgs)
    assert out.shape == imgs.shape
    assert np.abs(np.asarray(out) - np.asarray(imgs)).max() > 0  # shifted

    cj = color_jitter(jax.random.key(2), imgs)
    assert (np.asarray(cj) >= 0).all() and (np.asarray(cj) <= 1).all()
    assert np.abs(np.asarray(cj) - np.asarray(imgs)).max() > 1e-3

    g = random_grayscale(jax.random.key(3), imgs, p=1.0)
    gr = np.asarray(g)
    np.testing.assert_allclose(gr[..., 0], gr[..., 1], atol=1e-6)


def test_grad_accumulation():
    from real_robot_nerf_actor_tpu.train.trainer import (
        OptimConfig, make_optimizer)
    import optax
    tx = make_optimizer(OptimConfig(lr=0.1, accum_steps=2))
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    up1, state = tx.update(g, state, params)
    p1 = optax.apply_updates(params, up1)
    # first micro-step: no change yet
    np.testing.assert_allclose(np.asarray(p1["w"]), 1.0)
    up2, state = tx.update(g, state, p1)
    p2 = optax.apply_updates(p1, up2)
    assert np.abs(np.asarray(p2["w"]) - 1.0).max() > 1e-3  # applied
