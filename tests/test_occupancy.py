"""Occupancy-based sample compaction (ops/occupancy.py + renderer
sampling_mode='occupancy').

Mechanism tests here; render-quality on a trained checkpoint is measured by
the flagship harness (scripts/eval_quality.py, BENCH_NOTES r3). Reference
context: the compacted sampler replaces the uniform stratified coarse pass
of /root/reference/neural_rendering.py:159-178 as an opt-in perf mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real_robot_nerf_actor_tpu.ops.occupancy import (
    occupied_aabb, pool_occupancy, sample_occupancy, tighten_rays)

BOUNDS = jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])


def test_pool_and_dilate():
    occ = jnp.zeros((8, 8, 8)).at[4, 4, 4].set(1.0)
    p = pool_occupancy(occ, pool=4, dilate=0)
    assert p.shape == (2, 2, 2)
    assert float(p[1, 1, 1]) == 1.0 and float(p.sum()) == 1.0
    pd = pool_occupancy(occ, pool=4, dilate=1)
    assert float(pd.sum()) == 8.0  # dilation floods the 2^3 neighborhood


def test_occupied_aabb_slab_and_empty():
    occ = jnp.zeros((8, 8, 8)).at[:, :, 2].set(1.0)  # z-slab cell 2
    aabb = occupied_aabb(occ)
    np.testing.assert_allclose(np.asarray(aabb[:, 2]), [2 / 8, 3 / 8])
    np.testing.assert_allclose(np.asarray(aabb[:, 0]), [0.0, 1.0])
    empty = occupied_aabb(jnp.zeros((8, 8, 8)))
    np.testing.assert_allclose(np.asarray(empty), [[0, 0, 0], [1, 1, 1]])


def test_tighten_rays_hit_and_miss():
    # unit box [0,1]^3; occupied AABB = z in [0.25, 0.5]
    aabb = jnp.asarray([[0.0, 0.0, 0.25], [1.0, 1.0, 0.5]])
    # ray straight down +z->-z from above the box
    hit = jnp.asarray([[0.5, 0.5, 2.0, 0.0, 0.0, -1.0, 0.1, 4.0]])
    t = tighten_rays(hit, aabb, BOUNDS)
    np.testing.assert_allclose(np.asarray(t[0, 6:]), [1.5, 1.75], atol=1e-6)
    # ray pointing away misses: near == far == original far
    miss = jnp.asarray([[0.5, 0.5, 2.0, 0.0, 0.0, 1.0, 0.1, 4.0]])
    t = tighten_rays(miss, aabb, BOUNDS)
    np.testing.assert_allclose(np.asarray(t[0, 6:]), [4.0, 4.0])
    # near/far clamp to the original interval
    wide = jnp.asarray([[0.5, 0.5, 2.0, 0.0, 0.0, -1.0, 1.6, 4.0]])
    t = tighten_rays(wide, aabb, BOUNDS)
    np.testing.assert_allclose(np.asarray(t[0, 6:]), [1.6, 1.75], atol=1e-6)


def test_sample_occupancy_concentrates():
    """With an occupied z-slab, nearly the whole sample budget lands inside
    it (the floor keeps a trickle elsewhere)."""
    vp = 16
    occ = jnp.zeros((vp, vp, vp)).at[:, :, 6:8].set(1.0)  # z in [6/16, 8/16]
    rays = jnp.tile(jnp.asarray([[0.5, 0.5, 2.0, 0.0, 0.0, -1.0, 0.1, 2.0]]),
                    (64, 1))
    z = sample_occupancy(jax.random.key(0), rays, occ, 32, BOUNDS,
                         n_probe=32, floor=0.002)
    assert z.shape == (64, 32)
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))  # sorted
    pts_z = 2.0 - z  # world z of the sample
    # samples chosen from a probe bin jitter across the FULL bin, so edge
    # bins spill up to one probe-bin width past the exact slab (that IS the
    # intended safety margin); measure against the margin-expanded slab
    binw = (2.0 - 0.1) / 32
    inside = (pts_z >= 6 / 16) & (pts_z <= 8 / 16)
    inside_m = (pts_z >= 6 / 16 - binw) & (pts_z <= 8 / 16 + binw)
    assert float(inside.mean()) > 0.75
    assert float(inside_m.mean()) > 0.93
    # samples stay inside [near, far]
    assert float(z.min()) >= 0.1 and float(z.max()) <= 2.0


def test_sample_occupancy_empty_grid_is_uniformish():
    """All-floor pdf degrades to (jittered) uniform coverage."""
    vp = 8
    occ = jnp.zeros((vp, vp, vp))
    rays = jnp.tile(jnp.asarray([[0.5, 0.5, 2.0, 0.0, 0.0, -1.0, 0.0, 2.0]]),
                    (256, 1))
    z = sample_occupancy(jax.random.key(1), rays, occ, 16, BOUNDS,
                         n_probe=16, floor=0.01)
    # mean close to interval midpoint, samples span the interval
    assert abs(float(z.mean()) - 1.0) < 0.1
    assert float(z.max()) > 1.7 and float(z.min()) < 0.3


def test_renderer_occupancy_mode_smoke():
    """render_rays with sampling_mode='occupancy' produces finite outputs
    of the right shapes, and importance-fine works over non-uniform z."""
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig

    cfg = RendererConfig(
        image_width=8, image_height=8, n_coarse=8, n_fine=6, n_fine_depth=2,
        sampling_mode="occupancy", occ_pool=2, occ_probes=8,
        field=NerfFieldConfig(d_latent=4, d_embed=4, d_hidden=16, n_blocks=2,
                              combine_layer=1,
                              coord_bounds=(0, 0, 0, 1, 1, 1)))
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    # a live density so compositing weights are non-degenerate
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(1.0))
    vox = jax.random.normal(jax.random.key(1), (1, 8, 8, 8, 4))
    occ_ch = jnp.zeros((8, 8, 8)).at[2:6, 2:6, 2:6].set(1.0)
    occ = r.prepare_occupancy(occ_ch)
    rays = jnp.tile(jnp.asarray([[0.5, 0.5, 2.5, 0.0, 0.0, -1.0, 0.5, 4.0]]),
                    (16, 1))
    out = jax.jit(lambda p, v, rr, k: r.render_rays(p, v, rr, k, occ=occ))(
        params, vox, rays, jax.random.key(2))
    f = out["fine"]
    assert f.rgb.shape == (16, 3) and f.depth.shape == (16,)
    assert np.isfinite(np.asarray(f.rgb)).all()
    assert np.isfinite(np.asarray(f.depth)).all()
    assert float(f.weights.sum()) > 0.0


def test_renderer_occupancy_constant_field_matches_stratified():
    """Compositing a CONSTANT field is a placement-invariant quadrature
    (weights depend only on the interval covered), so occupancy-placed and
    stratified samples must produce the same ray colors/depths up to edge
    jitter — an exactness check on the whole occupancy render path."""
    import dataclasses
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig

    field = NerfFieldConfig(d_latent=4, d_embed=4, d_hidden=16, n_blocks=2,
                            combine_layer=1, coord_bounds=(0, 0, 0, 1, 1, 1))
    base = RendererConfig(n_coarse=32, n_fine=16, n_fine_depth=0,
                          field=field)
    r_strat = NeuralRenderer(base)
    r_occ = NeuralRenderer(dataclasses.replace(
        base, sampling_mode="occupancy", occ_pool=2, occ_probes=32,
        occ_tighten=False))
    params = r_strat.init_params(jax.random.key(0))
    # zero every kernel -> the field output is EXACTLY lin_out_bias
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"]
        .at[0].set(0.3).at[1].set(-0.2).at[2].set(0.8).at[3].set(0.5))
    vox = jnp.zeros((1, 8, 8, 8, 4))
    occ = r_occ.prepare_occupancy(jnp.ones((8, 8, 8)))
    # the sampled interval must lie INSIDE the occupancy grid: probes
    # outside the canonical box are down-weighted by design, which would
    # (correctly) divert samples and break the constant-field equivalence
    rays = jnp.asarray(np.concatenate([
        np.tile([[0.5, 0.5, 1.0]], (32, 1)),
        np.random.default_rng(0).normal([0, 0, -1], 0.02, (32, 3)),
        np.tile([[0.05, 0.95]], (32, 1))], axis=-1), jnp.float32)
    a = r_strat.render_rays(params, vox, rays, jax.random.key(3))["fine"]
    b = r_occ.render_rays(params, vox, rays, jax.random.key(3),
                          occ=occ)["fine"]
    assert float(jnp.abs(a.rgb).max()) > 0.1  # live, non-black field
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                               atol=0.03)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=0.1)


def test_renderer_tighten_only_mode():
    """occ_probes=0 (tighten-only): zero probe gathers, stratified samples
    confined to the occupied slab's t-interval."""
    import dataclasses
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig

    cfg = RendererConfig(
        n_coarse=8, n_fine=4, n_fine_depth=0, sampling_mode="occupancy",
        occ_pool=2, occ_probes=0, occ_dilate=0,
        field=NerfFieldConfig(d_latent=4, d_embed=4, d_hidden=16, n_blocks=2,
                              combine_layer=1,
                              coord_bounds=(0, 0, 0, 1, 1, 1)))
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(1.0))
    vox = jax.random.normal(jax.random.key(1), (1, 8, 8, 8, 4))
    # occupied z-slab: canonical z in [0.25, 0.5]
    occ = r.prepare_occupancy(jnp.zeros((8, 8, 8)).at[:, :, 2:4].set(1.0))
    rays = jnp.tile(jnp.asarray([[0.5, 0.5, 2.0, 0.0, 0.0, -1.0, 0.1, 4.0]]),
                    (8, 1))
    out = r.render_rays(params, vox, rays, jax.random.key(2), occ=occ)
    f = out["fine"]
    assert np.isfinite(np.asarray(f.rgb)).all()
    # all compositing mass sits at t in [2.0-0.5, 2.0-0.25] = [1.5, 1.75]
    w = np.asarray(f.weights)
    assert w.sum() > 0


def test_prepare_occupancy_from_field():
    """Field-derived occupancy (occ_source='field'): a constant-density
    field marks everything occupied above threshold and nothing below; on
    a random field, raising occ_alpha_thresh only ever REMOVES cells."""
    import dataclasses
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig

    field = NerfFieldConfig(d_latent=4, d_embed=4, d_hidden=16, n_blocks=2,
                            combine_layer=1, coord_bounds=(0, 0, 0, 1, 1, 1))
    cfg = RendererConfig(occ_pool=2, occ_dilate=0, occ_field_probes=2,
                         occ_alpha_thresh=0.01, field=field)
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    vox = jnp.zeros((1, 8, 8, 8, 4))

    # sigma == relu(bias): high bias -> alpha over a cell >> thresh
    hot = jax.tree_util.tree_map(lambda x: x, params)
    hot["params"]["mlp_coarse"]["lin_out_bias"] = (
        hot["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(5.0))
    occ = r.prepare_occupancy_from_field(hot, vox)
    assert occ.pooled.shape == (4, 4, 4)
    assert float(occ.pooled.min()) == 1.0
    np.testing.assert_allclose(np.asarray(occ.aabb), [[0, 0, 0], [1, 1, 1]])

    # zero bias -> sigma 0 -> empty grid, aabb degrades to the full box
    occ0 = r.prepare_occupancy_from_field(params, vox)
    assert float(occ0.pooled.max()) == 0.0
    np.testing.assert_allclose(np.asarray(occ0.aabb), [[0, 0, 0], [1, 1, 1]])

    # random field: occupancy is monotone non-increasing in the threshold
    rnd = NeuralRenderer(cfg).init_params(jax.random.key(3))
    vox_r = jax.random.normal(jax.random.key(4), (1, 8, 8, 8, 4)) * 2.0
    lo = r.prepare_occupancy_from_field(rnd, vox_r)
    r_hi = NeuralRenderer(dataclasses.replace(cfg, occ_alpha_thresh=0.5))
    hi = r_hi.prepare_occupancy_from_field(rnd, vox_r)
    assert np.all(np.asarray(hi.pooled) <= np.asarray(lo.pooled))


def test_ray_plan_culled_render_matches_unculled():
    """plan_rays + render_image(plan=...) == render_image(occ=...) exactly
    on a mask_outside field: culled rays' samples sit at the far plane,
    outside coord_bounds, where sigma is hard-zeroed -> pure background
    either way. Also checks the plan's active set is a strict subset."""
    import dataclasses
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig

    cfg = RendererConfig(
        image_width=16, image_height=12, n_coarse=8, n_fine=4,
        n_fine_depth=0, z_near=0.5, z_far=6.0, render_tile=64,
        sampling_mode="occupancy", occ_pool=2, occ_probes=8,
        field=NerfFieldConfig(d_latent=4, d_embed=4, d_hidden=16, n_blocks=2,
                              combine_layer=1,
                              coord_bounds=(0, 0, 0, 1, 1, 1),
                              mask_outside=True))
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(2.0))
    vox = jax.random.normal(jax.random.key(1), (1, 8, 8, 8, 4))
    # occupy a small blob so a good fraction of the frame misses
    occ = r.prepare_occupancy(
        jnp.zeros((8, 8, 8)).at[3:5, 3:5, 3:5].set(1.0))
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.5, 0.5, 3.0]
    pose_j = jnp.asarray(pose)[None]
    focal = jnp.asarray(12.0)
    plan = r.plan_rays(occ, pose_j, focal)
    assert 0 < plan.n_active < plan.n_total
    key = jax.random.key(7)
    rgb_a, emb_a, dep_a = r.render_image(params, vox, pose_j, focal, key,
                                         occ=occ)
    rgb_b, emb_b, dep_b = r.render_image(params, vox, pose_j, focal, key,
                                         occ=occ, plan=plan)
    # identical RNG consumption differs per tile, so compare with a small
    # tolerance on the active rays and exactness on the culled ones
    hit = np.zeros(plan.n_total, bool)
    hit[np.asarray(plan.idx)[:plan.n_active]] = True
    hit = hit.reshape(12, 16)
    np.testing.assert_array_equal(np.asarray(rgb_b)[~hit], 0.0)
    np.testing.assert_array_equal(np.asarray(dep_b)[~hit], 0.0)
    # unculled misses must also composite to (near-)black
    assert float(np.abs(np.asarray(rgb_a)[~hit]).max()) < 1e-5
    # per-ray sampling is keyed per tile; culling changes tiling, so allow
    # sampling jitter on hit rays
    assert float(np.abs(np.asarray(rgb_b)[hit] -
                        np.asarray(rgb_a)[hit]).max()) < 0.15


def test_prepare_refuses_unbounded_field():
    """Occupancy serving on an UNBOUNDED checkpoint (mask_outside=False,
    the reference's shipped nerfact.conf) must fall back to stratified
    sampling: the ray tighten cuts out-of-box density regardless of
    occ_source — measured on the unmasked round-3 flagship, every source
    collapsed identically to PSNR 15.7 vs 28.0
    (artifacts/round3_flagship/quality_occsources.json)."""
    import dataclasses
    import warnings
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.render import (NeuralRenderer,
                                                  RendererConfig)

    cfg = RendererConfig(
        image_width=8, image_height=8, n_coarse=4, n_fine=0,
        sampling_mode="occupancy", occ_pool=2,
        field=NerfFieldConfig(d_latent=4, d_embed=4, d_hidden=16,
                              n_blocks=2, combine_layer=1,
                              coord_bounds=(0, 0, 0, 1, 1, 1),
                              mask_outside=False))
    r = NeuralRenderer(cfg)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        occ = r.prepare(occupancy=jnp.ones((8, 8, 8)))
    assert occ is None
    assert any("bounded-domain" in str(x.message) for x in w)
    # bounded field: prepare dispatches normally
    r2 = NeuralRenderer(dataclasses.replace(
        cfg, field=dataclasses.replace(cfg.field, mask_outside=True)))
    assert r2.prepare(occupancy=jnp.ones((8, 8, 8))) is not None
    # explicit override keeps the old behavior
    r3 = NeuralRenderer(dataclasses.replace(cfg, occ_require_bounded=False))
    assert r3.prepare(occupancy=jnp.ones((8, 8, 8))) is not None
