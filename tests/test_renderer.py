"""Renderer integration tests at tiny sizes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig, psnr


@pytest.fixture(scope="module")
def renderer():
    cfg = RendererConfig(
        image_width=8, image_height=6, n_coarse=8, n_fine=4, n_fine_depth=2,
        ray_chunk_size=16, render_tile=16,
        field=NerfFieldConfig(d_latent=4, d_embed=8, d_hidden=16, n_blocks=2,
                              combine_layer=1,
                              coord_bounds=(-1., -1., -1., 1., 1., 1.)))
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    vox = jax.random.normal(jax.random.key(1), (1, 5, 5, 5, 4))
    return r, params, vox


def _pose():
    # camera at z=+2.5 looking toward origin (-z direction)
    p = np.eye(4, dtype=np.float32)
    p[2, 3] = 2.5
    return jnp.asarray(p)[None]


def test_render_rays_shapes(renderer):
    r, params, vox = renderer
    from real_robot_nerf_actor_tpu.ops import gen_rays
    rays = gen_rays(_pose(), 8, 6, jnp.asarray(7.0), 1.2, 4.0).reshape(-1, 8)[:16]
    out = r.render_rays(params, vox, rays, jax.random.key(2))
    assert out["coarse"].rgb.shape == (16, 3)
    assert out["coarse"].weights.shape == (16, 8)
    # fine pass evaluates the sorted union: Kc + (Kf-Kfd) + Kfd = Kc + Kf
    assert out["fine"].weights.shape == (16, 8 + 4)
    assert out["fine"].embed.shape == (16, 8)
    assert np.isfinite(np.asarray(out["fine"].rgb)).all()


def test_render_image_shapes(renderer):
    r, params, vox = renderer
    rgb, embed, depth = r.render_image(params, vox, _pose(), jnp.asarray(7.0),
                                       jax.random.key(3))
    assert rgb.shape == (6, 8, 3)
    assert embed.shape == (6, 8, 8)
    assert depth.shape == (6, 8)
    assert np.isfinite(np.asarray(rgb)).all()
    d = np.asarray(depth)
    # depth = sum(w * z): nonnegative and bounded by far for any weights
    assert (d >= 0).all() and (d <= 4.2).all()


def test_rendering_loss_and_grads(renderer):
    r, params, vox = renderer
    gt_rgb = jnp.ones((1, 6, 8, 3)) * 0.5
    gt_embed = jnp.zeros((1, 6, 8, 8))

    def loss_fn(p, v):
        loss, m = r.rendering_loss(p, v, gt_rgb, _pose(), jnp.asarray(7.0),
                                   jax.random.key(4), gt_embed=gt_embed)
        return loss

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, vox)
    assert np.isfinite(float(loss))
    # gradients flow into BOTH the MLP params and the voxel features
    # (the voxel grad is what trains the PerceiverIO encoder jointly)
    gp = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads[0]))
    gv = float(jnp.abs(grads[1]).sum())
    assert gp > 0
    assert gv > 0


def test_psnr():
    assert float(psnr(jnp.ones((4, 3)) * 0.5, jnp.ones((4, 3)) * 0.5)) > 90
    assert abs(float(psnr(jnp.zeros((4, 3)), jnp.ones((4, 3))))) < 1e-4


def test_proposal_mode_renders_and_trains():
    import dataclasses
    cfg = RendererConfig(
        image_width=8, image_height=6, n_coarse=8, n_fine=4, n_fine_depth=2,
        ray_chunk_size=16, render_tile=16,
        field=NerfFieldConfig(d_latent=4, d_embed=8, d_hidden=16, n_blocks=2,
                              combine_layer=1, use_proposal=True,
                              proposal_hidden=8, proposal_blocks=1,
                              coord_bounds=(-1., -1., -1., 1., 1., 1.)))
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    vox = jax.random.normal(jax.random.key(1), (1, 5, 5, 5, 4))
    from real_robot_nerf_actor_tpu.ops import gen_rays
    rays = gen_rays(_pose(), 8, 6, jnp.asarray(7.0), 1.2, 4.0).reshape(-1, 8)[:16]
    out = r.render_rays(params, vox, rays, jax.random.key(2))
    # fine pass composites only the n_fine new samples
    assert out["fine"].weights.shape == (16, 4)
    assert np.isfinite(np.asarray(out["fine"].rgb)).all()

    gt_rgb = jnp.ones((1, 6, 8, 3)) * 0.4
    gt_embed = jnp.zeros((1, 6, 8, 8))
    loss, m = r.rendering_loss(params, vox, gt_rgb, _pose(), jnp.asarray(7.0),
                               jax.random.key(3), gt_embed=gt_embed)
    assert np.isfinite(float(loss))
    assert "loss_embed_coarse" not in m  # proposal emits no coarse embed
    g = jax.grad(lambda p: r.rendering_loss(
        p, vox, gt_rgb, _pose(), jnp.asarray(7.0), jax.random.key(3),
        gt_embed=gt_embed)[0])(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(x).sum()) > 0 for x in leaves)


def test_fused_int8_mlp_backend_close_to_xla():
    """mlp_backend='pallas_int8' (interpret off-TPU): same params, same
    render within W8A8 quantization tolerance."""
    import dataclasses
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.ops import gen_rays

    field = NerfFieldConfig(d_latent=8, d_embed=16, d_hidden=32, n_blocks=3,
                            combine_layer=2)
    cfg = RendererConfig(image_width=8, image_height=8, n_coarse=6, n_fine=4,
                         n_fine_depth=2, field=field)
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(1.0))
    vox = jax.random.normal(jax.random.key(1), (1, 6, 6, 6, 8))
    pose = np.eye(4, dtype=np.float32); pose[2, 3] = 2.5
    rays = gen_rays(jnp.asarray(pose)[None], 8, 8, jnp.asarray(7.0),
                    cfg.z_near, cfg.z_far).reshape(-1, 8)

    out_a = r.render_rays(params, vox, rays, jax.random.key(2))
    cfg_q = dataclasses.replace(
        cfg, field=dataclasses.replace(field, mlp_backend="pallas_int8"))
    rq = NeuralRenderer(cfg_q)
    out_b = rq.render_rays(params, vox, rays, jax.random.key(2))
    a = np.asarray(out_a["fine"].rgb, np.float32)
    b = np.asarray(out_b["fine"].rgb, np.float32)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 0.1, np.abs(a - b).max()


def test_static_act_scales_close_to_dynamic():
    """field.int8_static_act: calibrated static per-layer activation scales
    render within tolerance of BOTH dynamic-quant int8 and the xla f32
    path; rendering without calibration fails fast."""
    import dataclasses
    from real_robot_nerf_actor_tpu.ops import gen_rays

    field = NerfFieldConfig(d_latent=8, d_embed=16, d_hidden=32, n_blocks=3,
                            combine_layer=2, mlp_backend="pallas_int8")
    cfg = RendererConfig(image_width=8, image_height=8, n_coarse=6, n_fine=4,
                         n_fine_depth=2, field=field)
    r_dyn = NeuralRenderer(cfg)
    params = r_dyn.init_params(jax.random.key(0))
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(1.0))
    vox = jax.random.normal(jax.random.key(1), (1, 6, 6, 6, 8))
    pose = np.eye(4, dtype=np.float32); pose[2, 3] = 2.5
    rays = gen_rays(jnp.asarray(pose)[None], 8, 8, jnp.asarray(7.0),
                    cfg.z_near, cfg.z_far).reshape(-1, 8)

    r_sta = NeuralRenderer(dataclasses.replace(
        cfg, field=dataclasses.replace(field, int8_static_act=True)))
    with pytest.raises(AssertionError, match="calibrate_int8_act"):
        r_sta.render_rays(params, vox, rays, jax.random.key(2))
    scales = r_sta.calibrate_int8_act(params, vox, rays,
                                      key=jax.random.key(5))
    assert len(scales) == 2 * field.n_blocks
    assert all(s > 0 for s in scales)

    out_dyn = r_dyn.render_rays(params, vox, rays, jax.random.key(2))
    out_sta = r_sta.render_rays(params, vox, rays, jax.random.key(2))
    d = np.asarray(out_dyn["fine"].rgb, np.float32)
    s = np.asarray(out_sta["fine"].rgb, np.float32)
    assert np.isfinite(s).all()
    # static scales change which int8 code each activation rounds to; the
    # two int8 variants agree to quantization tolerance, and static stays
    # within the same band of the f32 reference the dynamic test allows
    assert np.abs(d - s).max() < 0.1, np.abs(d - s).max()

    r_xla = NeuralRenderer(dataclasses.replace(
        cfg, field=dataclasses.replace(field, mlp_backend="xla")))
    x = np.asarray(r_xla.render_rays(params, vox, rays,
                                     jax.random.key(2))["fine"].rgb,
                   np.float32)
    assert np.abs(x - s).max() < 0.1, np.abs(x - s).max()


def test_gather_fused_mlp_matches_unfused():
    """field.gather_fused_mlp: the one-kernel gather+lerp+MLP serving path
    is EXACT vs the unfused chain (gather -> corner_lerp ->
    fused_resnetfc_int8) — same config, same keys, identical renders —
    including composed with static activation scales."""
    import dataclasses
    from real_robot_nerf_actor_tpu.ops import gen_rays

    field = NerfFieldConfig(d_latent=8, d_embed=16, d_hidden=32, n_blocks=3,
                            combine_layer=2, mlp_backend="pallas_int8")
    cfg = RendererConfig(image_width=8, image_height=8, n_coarse=6, n_fine=4,
                         n_fine_depth=2, field=field)
    r_ref = NeuralRenderer(cfg)
    params = r_ref.init_params(jax.random.key(0))
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(1.0))
    vox = jax.random.normal(jax.random.key(1), (1, 6, 6, 6, 8))
    pose = np.eye(4, dtype=np.float32); pose[2, 3] = 2.5
    rays = gen_rays(jnp.asarray(pose)[None], 8, 8, jnp.asarray(7.0),
                    cfg.z_near, cfg.z_far).reshape(-1, 8)

    out_ref = r_ref.render_rays(params, vox, rays, jax.random.key(2))
    r_gf = NeuralRenderer(dataclasses.replace(
        cfg, field=dataclasses.replace(field, gather_fused_mlp=True)))
    out_gf = r_gf.render_rays(params, vox, rays, jax.random.key(2))
    for pass_ in ("coarse", "fine"):
        a = np.asarray(out_ref[pass_].rgb, np.float32)
        b = np.asarray(out_gf[pass_].rgb, np.float32)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=0,
                                   err_msg=pass_)

    # composed with static activation scales: both paths calibrated the
    # same way must also agree exactly
    f_sta = dataclasses.replace(field, int8_static_act=True)
    r_sta = NeuralRenderer(dataclasses.replace(cfg, field=f_sta))
    r_sta_gf = NeuralRenderer(dataclasses.replace(
        cfg, field=dataclasses.replace(f_sta, gather_fused_mlp=True)))
    for r_ in (r_sta, r_sta_gf):
        r_.calibrate_int8_act(params, vox, rays, key=jax.random.key(5))
    a = np.asarray(r_sta.render_rays(params, vox, rays,
                                     jax.random.key(2))["fine"].rgb,
                   np.float32)
    b = np.asarray(r_sta_gf.render_rays(params, vox, rays,
                                        jax.random.key(2))["fine"].rgb,
                   np.float32)
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


def test_fused_bf16_mlp_backend_close_to_xla():
    """mlp_backend='pallas_bf16' (interpret off-TPU): same params, same
    render to bf16/f32-accumulation tolerance (no quantization)."""
    import dataclasses
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.ops import gen_rays

    field = NerfFieldConfig(d_latent=8, d_embed=16, d_hidden=32, n_blocks=3,
                            combine_layer=2)
    cfg = RendererConfig(image_width=8, image_height=8, n_coarse=6, n_fine=4,
                         n_fine_depth=2, field=field)
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(1.0))
    vox = jax.random.normal(jax.random.key(1), (1, 6, 6, 6, 8))
    pose = np.eye(4, dtype=np.float32); pose[2, 3] = 2.5
    rays = gen_rays(jnp.asarray(pose)[None], 8, 8, jnp.asarray(7.0),
                    cfg.z_near, cfg.z_far).reshape(-1, 8)

    out_a = r.render_rays(params, vox, rays, jax.random.key(2))
    cfg_q = dataclasses.replace(
        cfg, field=dataclasses.replace(field, mlp_backend="pallas_bf16"))
    rq = NeuralRenderer(cfg_q)
    out_b = rq.render_rays(params, vox, rays, jax.random.key(2))
    a = np.asarray(out_a["fine"].rgb, np.float32)
    b = np.asarray(out_b["fine"].rgb, np.float32)
    assert np.isfinite(b).all()
    # bf16 packed rows vs fp32 XLA path: rounding-level agreement
    assert np.abs(a - b).max() < 0.03, np.abs(a - b).max()


def test_fused_backend_replicates_mask_outside():
    """field.mask_outside with the fused pallas_bf16 backend: the fused
    path bypasses VoxelNerfField.__call__, so the renderer replicates the
    bounded-domain sigma mask — masked fused render must stay close to the
    masked XLA render (default z_far 4.0 puts many samples out-of-box on
    this tiny grid, so an unreplicated mask shows up as a gross diff)."""
    import dataclasses
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.ops import gen_rays

    field = NerfFieldConfig(d_latent=8, d_embed=16, d_hidden=32, n_blocks=3,
                            combine_layer=2, mask_outside=True)
    cfg = RendererConfig(image_width=8, image_height=8, n_coarse=6, n_fine=4,
                         n_fine_depth=2, field=field)
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(1.0))
    vox = jax.random.normal(jax.random.key(1), (1, 6, 6, 6, 8))
    pose = np.eye(4, dtype=np.float32); pose[2, 3] = 2.5
    rays = gen_rays(jnp.asarray(pose)[None], 8, 8, jnp.asarray(7.0),
                    cfg.z_near, cfg.z_far).reshape(-1, 8)
    out_a = r.render_rays(params, vox, rays, jax.random.key(2))
    rq = NeuralRenderer(dataclasses.replace(
        cfg, field=dataclasses.replace(field, mlp_backend="pallas_bf16")))
    out_b = rq.render_rays(params, vox, rays, jax.random.key(2))
    a = np.asarray(out_a["fine"].rgb, np.float32)
    b = np.asarray(out_b["fine"].rgb, np.float32)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 0.03, np.abs(a - b).max()
    # and the mask actually bites: unmasked xla render differs materially
    r_unmasked = NeuralRenderer(dataclasses.replace(
        cfg, field=dataclasses.replace(field, mask_outside=False)))
    c = np.asarray(r_unmasked.render_rays(params, vox, rays,
                                          jax.random.key(2))["fine"].rgb,
                   np.float32)
    assert np.abs(a - c).max() > 0.05, np.abs(a - c).max()


def test_fused_backend_engages_below_gather_breakeven():
    """A configured fused backend must engage even when rays*samples <
    grid cells (the auto expand heuristic says no). Regression: at 80x60
    over the 100^3 grid the pallas variants silently fell back to XLA and
    the quality harness measured bit-identical 'backends'. int8
    quantization guarantees a nonzero (but bounded) difference when the
    fused path actually runs."""
    import dataclasses
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.ops import gen_rays

    field = NerfFieldConfig(d_latent=8, d_embed=16, d_hidden=32, n_blocks=3,
                            combine_layer=2)
    cfg = RendererConfig(image_width=8, image_height=8, n_coarse=6, n_fine=4,
                         n_fine_depth=2, field=field)
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(1.0))
    # 16^3 = 4096 cells >> 64 rays * 12 samples = 768 rows: auto says no
    vox = jax.random.normal(jax.random.key(1), (1, 16, 16, 16, 8))
    pose = np.eye(4, dtype=np.float32); pose[2, 3] = 2.5
    rays = gen_rays(jnp.asarray(pose)[None], 8, 8, jnp.asarray(7.0),
                    cfg.z_near, cfg.z_far).reshape(-1, 8)
    assert not NeuralRenderer(cfg)._should_expand(rays.shape[0], vox)
    rq = NeuralRenderer(dataclasses.replace(
        cfg, field=dataclasses.replace(field, mlp_backend="pallas_int8")))
    assert rq._should_expand(rays.shape[0], vox)
    a = np.asarray(r.render_rays(params, vox, rays, jax.random.key(2))
                   ["fine"].rgb, np.float32)
    b = np.asarray(rq.render_rays(params, vox, rays, jax.random.key(2))
                   ["fine"].rgb, np.float32)
    d = np.abs(a - b).max()
    assert 0.0 < d < 0.1, d  # 0.0 == the silent-fallback signature


def test_fused_backend_composes_with_proposal_mode():
    """Proposal sampler coarse (XLA small MLP) + fused-backend fine pass:
    finite render, close to the XLA proposal render."""
    import dataclasses
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.ops import gen_rays

    field = NerfFieldConfig(d_latent=8, d_embed=16, d_hidden=32, n_blocks=3,
                            combine_layer=2, use_proposal=True,
                            proposal_hidden=16, proposal_blocks=1)
    cfg = RendererConfig(image_width=8, image_height=8, n_coarse=6, n_fine=4,
                         n_fine_depth=0, field=field)
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    for m in ("mlp_coarse", "mlp_proposal"):
        params["params"][m]["lin_out_bias"] = (
            params["params"][m]["lin_out_bias"].at[3].set(1.0))
    vox = jax.random.normal(jax.random.key(1), (1, 6, 6, 6, 8))
    pose = np.eye(4, dtype=np.float32); pose[2, 3] = 2.5
    rays = gen_rays(jnp.asarray(pose)[None], 8, 8, jnp.asarray(7.0),
                    cfg.z_near, cfg.z_far).reshape(-1, 8)
    a = r.render_rays(params, vox, rays, jax.random.key(2))["fine"].rgb
    rq = NeuralRenderer(dataclasses.replace(
        cfg, field=dataclasses.replace(field, mlp_backend="pallas_bf16")))
    b = rq.render_rays(params, vox, rays, jax.random.key(2))["fine"].rgb
    a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 0.03, np.abs(a - b).max()
