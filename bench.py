"""Benchmark: NeRF rendering throughput (headline) + voxel-policy latency on
the real TPU chip.

Prints ONE JSON line:
  {"metric": "nerf_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N, ...extras}

Baseline: the reference publishes no numbers (BASELINE.md). The denominator
is a documented estimate of the reference PyTorch renderer on one GPU:
512-ray training chunks with 64+48 samples/ray through 4096-point MLP
chunks (nerfact.conf:54,74-86) sustains ~1e5 rays/s on the class of GPU the
scripts target; BASELINE.json's goal is >10x that per chip.
"""
from __future__ import annotations

import json
import time

REFERENCE_RAYS_PER_SEC = 1.0e5  # documented estimate, see module docstring


def bench_nerf_render(n_iters: int = 8):
    import jax
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.ops import gen_rays
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig
    import numpy as np

    cfg = RendererConfig(
        image_width=128, image_height=128, n_coarse=64, n_fine=32,
        n_fine_depth=16, ray_chunk_size=512,
        field=NerfFieldConfig(d_latent=64, d_embed=512, d_hidden=512,
                              n_blocks=5, combine_layer=3))
    r = NeuralRenderer(cfg)
    params = r.init_params(jax.random.key(0))
    vox = jax.random.normal(jax.random.key(1), (1, 100, 100, 100, 64),
                            jnp.bfloat16).astype(jnp.float32)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 2.5
    rays = gen_rays(jnp.asarray(pose)[None], cfg.image_width, cfg.image_height,
                    jnp.asarray(112.0), cfg.z_near, cfg.z_far).reshape(-1, 8)
    n_rays = rays.shape[0]  # 16384

    render = jax.jit(lambda p, v, rr, k: r.render_rays(p, v, rr, k))
    out = render(params, vox, rays, jax.random.key(2))
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(n_iters):
        out = render(params, vox, rays, jax.random.key(3 + i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    return n_rays / dt


def bench_policy(n_iters: int = 20):
    import jax
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.models import PerceiverConfig, PerceiverIO
    from real_robot_nerf_actor_tpu.ops import choose_highest_action

    cfg = PerceiverConfig(depth=6, voxel_size=100, num_latents=2048,
                          latent_dim=512)
    net = PerceiverIO(cfg)
    v = cfg.voxel_size
    vox = jax.random.normal(jax.random.key(0), (1, v, v, v, cfg.initial_dim))
    proprio = jnp.zeros((1, cfg.low_dim_size))
    lang = jax.random.normal(jax.random.key(1),
                             (1, cfg.lang_max_seq_len, cfg.lang_emb_dim))
    params = net.init(jax.random.key(2), vox, proprio, lang)

    @jax.jit
    def act(params, vox, proprio, lang):
        q_trans, q_rot_grip, q_coll = net.apply(params, vox, proprio, lang)
        return choose_highest_action(q_trans, q_rot_grip, q_coll)

    out = act(params, vox, proprio, lang)
    jax.block_until_ready(out)
    lat = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = act(params, vox, proprio, lang)
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = lat[len(lat) // 2]
    return 1.0 / p50, p50 * 1000.0


def main():
    rays_per_sec = bench_nerf_render()
    actions_per_sec, p50_ms = bench_policy()
    print(json.dumps({
        "metric": "nerf_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
        "policy_actions_per_sec": round(actions_per_sec, 2),
        "policy_p50_latency_ms": round(p50_ms, 2),
    }))


if __name__ == "__main__":
    main()
