"""TPU smoke: gather_fused_mlp + int8_static_act at PRODUCTION field shapes."""
import dataclasses, numpy as np, jax, jax.numpy as jnp
from real_robot_nerf_actor_tpu.render.renderer import NeuralRenderer, RendererConfig
from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
from real_robot_nerf_actor_tpu.ops import gen_rays

print("devices:", jax.devices(), flush=True)
# production field: d_latent=64, d_hidden=512, 5 blocks, combine 3
field = NerfFieldConfig(mlp_backend="pallas_int8")
cfg = RendererConfig(image_width=16, image_height=12, n_coarse=8, n_fine=4,
                     n_fine_depth=2, field=field)
r_ref = NeuralRenderer(cfg)
params = r_ref.init_params(jax.random.key(0))
params["params"]["mlp_coarse"]["lin_out_bias"] = (
    params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(1.0))
vox = jax.random.normal(jax.random.key(1), (1, 12, 12, 12, 64))
pose = np.eye(4, dtype=np.float32); pose[2, 3] = 2.5
rays = gen_rays(jnp.asarray(pose)[None], 16, 12, jnp.asarray(11.0),
                cfg.z_near, cfg.z_far).reshape(-1, 8)
out_ref = r_ref.render_rays(params, vox, rays, jax.random.key(2))
print("unfused done", flush=True)
r_gf = NeuralRenderer(dataclasses.replace(
    cfg, field=dataclasses.replace(field, gather_fused_mlp=True)))
out_gf = r_gf.render_rays(params, vox, rays, jax.random.key(2))
for pass_ in ("coarse", "fine"):
    a = np.asarray(out_ref[pass_].rgb, np.float32)
    b = np.asarray(out_gf[pass_].rgb, np.float32)
    assert np.isfinite(b).all(), pass_
    d = np.abs(a - b).max()
    print(pass_, "max|ref-fused| =", d, flush=True)
    assert d < 1e-5, (pass_, d)
f_sta = dataclasses.replace(field, int8_static_act=True,
                            gather_fused_mlp=True)
r_sta = NeuralRenderer(dataclasses.replace(cfg, field=f_sta))
r_sta.calibrate_int8_act(params, vox, rays, key=jax.random.key(5))
s = np.asarray(r_sta.render_rays(params, vox, rays,
                                 jax.random.key(2))["fine"].rgb, np.float32)
assert np.isfinite(s).all()
print("static fused max|dyn-sta| =", np.abs(
    np.asarray(out_gf["fine"].rgb, np.float32) - s).max(), flush=True)
print("SMOKE_OK")
