"""Benchmark: NeRF rendering throughput (headline) + voxel-policy latency on
the real TPU chip.

Prints ONE JSON line:
  {"metric": "nerf_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N, ...extras}

Timing methodology (important on this sandbox): the axon tunnel's
block_until_ready does NOT synchronize with remote execution, and each
dispatch costs ~25 ms of tunnel round trip. So each measurement runs
`n_inner` iterations CHAINED inside one jitted lax.scan (true device time,
one dispatch) and fetches a single scalar checksum; the per-call round-trip
overhead (measured on a tiny op) is subtracted.

Baseline: the reference publishes no numbers (BASELINE.md). The denominator
is a documented estimate of the reference PyTorch renderer on one GPU:
512-ray chunks, 64+48 samples/ray, 4096-point MLP chunks
(nerfact.conf:54,74-86) sustains ~1e5 rays/s; BASELINE.json's goal is >10x
that per chip.

Headline semantics (round 3): "value" is the SERVING DEFAULT
(configs/serve.yaml — occupancy sample compaction + fused int8 MLP,
24+16 budgets), which is quality-gated on a trained checkpoint by
scripts/eval_quality.py (matches full-frame PSNR, beats foreground PSNR
vs the fp32 parity renderer; int8 max |drgb| 0.016 at parity budgets).
The reference-exact parity config (64+32+16, bf16) is recorded as
parity_rays_per_sec — compare against BENCH_r01/r02 "value" fields.
"""
from __future__ import annotations

import json
import sys
import time

REFERENCE_RAYS_PER_SEC = 1.0e5  # documented estimate, see module docstring


def _setup():
    import jax
    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def measure_rt_overhead(jax, n: int = 9) -> float:
    """Median-of-9 dispatch round trip: the tunnel occasionally spikes to
    100+ ms, and an inflated rt subtraction silently flatters every
    measurement (a 124 ms outlier once faked +20k rays/s)."""
    import jax.numpy as jnp
    f = jax.jit(lambda x: jnp.sum(x + 1.0))
    x = jnp.zeros((8, 128))
    float(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def timed_min(fetch, rt: float, n: int = 3) -> float:
    """Best-of-n wall time of `fetch` (a zero-arg call that dispatches one
    compiled program and blocks on its scalar result), minus the dispatch
    round trip. The tunnel occasionally stalls mid-run for tens of ms; a
    single-shot timing once inflated policy_device_ms 34 -> 49 ms within
    one bench invocation. min() removes additive transients."""
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fetch()
        best = min(best, time.perf_counter() - t0)
    return max(best - rt, 1e-9)


def scene_occupancy(jax):
    """Occupancy channel of the voxelized synthetic kitchen (realistic
    table-top sparsity, ~2% of cells at 100^3) for the occupancy modes."""
    import jax.numpy as jnp
    import numpy as np
    from real_robot_nerf_actor_tpu.data.replay import (PointCloudSample,
                                                       pad_point_cloud)
    from real_robot_nerf_actor_tpu.data.synthetic import make_synthetic_scene
    from real_robot_nerf_actor_tpu.ops import VoxelizerSpec, voxelize

    scene = make_synthetic_scene(seed=0)
    pts, cols, valid = pad_point_cloud(
        PointCloudSample(scene.points, scene.colors), 65536)
    bounds = jnp.asarray([-0.1, -0.3, -0.2, 0.8, 0.7, 0.7])
    vox = voxelize(jnp.asarray(pts)[None], jnp.asarray(cols)[None], bounds,
                   VoxelizerSpec(voxel_size=100, feature_size=3,
                                 max_num_coords=65536),
                   valid=jnp.asarray(valid)[None])
    return vox[0, ..., -1]


def bench_nerf_render(jax, rt: float, n_inner: int = 8,
                      dtype: str = "bfloat16", proposal: bool = False,
                      n_frames: int = 1, proposal_use_latent: bool = True,
                      mlp_backend: str = "xla", occupancy: bool = False,
                      n_coarse: int = 64, n_fine: int = 32,
                      n_fine_depth: int = 16, cull: bool = False,
                      camera: str = "serve", static_act: bool = False,
                      gather_fused: bool = False):
    import jax.numpy as jnp
    import numpy as np
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.ops import gen_rays
    from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig

    # camera="evalcam" (cull only): the recorded-kitchen EVAL frame —
    # 80x60 @ focal 76.18, the geometry scripts/eval_quality.py scores —
    # where ~83% of rays hit the occupied AABB. Reported alongside the
    # serving camera so the headline can never be camera-flattered
    # (round-4 VERDICT weak #2).
    ew, eh = (80, 60) if camera == "evalcam" else (128, 128)
    cfg = RendererConfig(
        image_width=ew, image_height=eh, n_coarse=n_coarse, n_fine=n_fine,
        n_fine_depth=n_fine_depth,
        sampling_mode="occupancy" if occupancy else "stratified",
        field=NerfFieldConfig(d_latent=64, d_embed=512, d_hidden=512,
                              n_blocks=5, combine_layer=3,
                              compute_dtype=dtype,
                              use_proposal=proposal,
                              proposal_use_latent=proposal_use_latent,
                              # the culled-frame exactness argument needs
                              # the bounded domain (see RayPlan docstring)
                              mask_outside=cull,
                              mlp_backend=mlp_backend,
                              int8_static_act=static_act,
                              gather_fused_mlp=gather_fused))
    r = NeuralRenderer(cfg)
    # pinned to the voxel source (not cfg.occ_source/prepare()): the bench
    # field is random with a +1 sigma bias, so field-derived occupancy is
    # everywhere-occupied and would no-op the tighten — unrepresentative of
    # a trained bounded field. Real-checkpoint quality gating of occ_source
    # lives in scripts/eval_quality.py (occauto/occfield variants).
    occ_state = r.prepare_occupancy(scene_occupancy(jax)) \
        if (occupancy or cull) else None
    params = r.init_params(jax.random.key(0))
    # a random init can land sigma <= 0 everywhere (all-zero weights); bias
    # the density head positive so the checksum certifies a live graph
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(1.0))
    if proposal:
        params["params"]["mlp_proposal"]["lin_out_bias"] = (
            params["params"]["mlp_proposal"]["lin_out_bias"].at[3].set(1.0))
    vox = jax.random.normal(jax.random.key(1), (1, 100, 100, 100, 64))

    if cull:
        # the recorded-kitchen serving viewpoint (gen_data's camera
        # geometry scaled to the 128x128 bench frame): ~50% of rays hit
        # the occupied AABB — the honest serving coverage, NOT the
        # overhead bench camera (11% hit: culling there flatters 9x).
        from real_robot_nerf_actor_tpu.data.synthetic import _look_at
        center = np.array([0.35, 0.2, 0.1], np.float32)
        eye = center + np.array([0.9, -0.75, 0.85], np.float32)
        pose = _look_at(eye, center)
        focal = (jnp.asarray(76.18) if camera == "evalcam"
                 else jnp.asarray(76.18 * 128.0 / 80.0))  # same FOV, 80-wide
    else:
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 2.5
        focal = jnp.asarray(112.0)
    pose_j = jnp.asarray(pose)[None]
    rays = gen_rays(pose_j, cfg.image_width, cfg.image_height,
                    focal, cfg.z_near, cfg.z_far).reshape(-1, 8)
    if n_frames > 1:
        # multi-frame serving throughput: concurrent frames share the scene,
        # per-ray math identical — amortizes fixed per-render costs
        rays = jnp.tile(rays, (n_frames, 1))
    n_rays = rays.shape[0]  # 16384 * n_frames
    plan = None
    active_frac = 1.0
    if cull:
        import dataclasses
        r_plan = NeuralRenderer(dataclasses.replace(cfg, render_tile=512))
        plan = r_plan.plan_rays(occ_state, pose_j, focal)
        active_frac = plan.n_active / plan.n_total
        rays = jnp.take(rays, plan.idx, axis=0, mode="clip")

    from real_robot_nerf_actor_tpu.ops.grid_sample import expand_corners

    if static_act:
        # once-per-scene host-side calibration (the serving lifecycle):
        # static per-layer int8 activation scales baked into the kernel
        r.calibrate_int8_act(params, vox, rays)

    @jax.jit
    def repeat_render(params, vox, rays, key):
        # serving semantics: the scene's voxel features are fixed across
        # frames — corner-expand once, render many
        vox_e = expand_corners(vox).astype(dtype)

        def body(carry, k):
            out = r.render_rays(params, vox_e, rays, k, pre_expanded=True,
                                occ=occ_state)
            f = out.get("fine", out["coarse"])
            rgb, depth = f.rgb, f.depth
            if plan is not None:
                # scatter the active rays back into the full frame (the
                # per-frame cost a culled serving render actually pays)
                rgb = jnp.zeros((n_rays, 3), rgb.dtype).at[plan.idx].set(
                    rgb, mode="drop")
                depth = jnp.zeros((n_rays,), depth.dtype).at[plan.idx].set(
                    depth, mode="drop")
            chk = (jnp.sum(rgb) + jnp.sum(depth.astype(jnp.float32))
                   ).astype(jnp.float32)
            return carry + chk, None

        keys = jax.random.split(key, n_inner)
        total, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return total

    chk = float(repeat_render(params, vox, rays, jax.random.key(2)))  # warmup
    assert chk == chk, "NaN checksum"
    assert chk != 0.0, "dead graph: zero checksum"
    dt = timed_min(
        lambda: float(repeat_render(params, vox, rays, jax.random.key(3))),
        rt)
    if cull:
        return n_rays * n_inner / dt, active_frac
    return n_rays * n_inner / dt


def bench_policy(jax, rt: float, n_inner: int = 10,
                 dtype: str = "bfloat16"):
    import dataclasses

    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.models import PerceiverConfig, PerceiverIO
    from real_robot_nerf_actor_tpu.ops import choose_highest_action

    cfg = PerceiverConfig(depth=6, voxel_size=100, num_latents=2048,
                          latent_dim=512, compute_dtype=dtype)
    net = PerceiverIO(cfg)
    v = cfg.voxel_size
    vox = jax.random.normal(jax.random.key(0), (1, v, v, v, cfg.initial_dim))
    proprio = jnp.zeros((1, cfg.low_dim_size))
    lang = jax.random.normal(jax.random.key(1),
                             (1, cfg.lang_max_seq_len, cfg.lang_emb_dim))
    params = net.init(jax.random.key(2), vox, proprio, lang)

    @jax.jit
    def repeat_act(params, vox, proprio, lang):
        def body(carry, i):
            # perturb the input so iterations can't be CSE'd into one
            q_trans, q_rot_grip, q_coll = net.apply(
                params, vox + i.astype(vox.dtype) * 1e-6, proprio, lang)
            coords, rot_grip, coll = choose_highest_action(
                q_trans, q_rot_grip, q_coll)
            return carry + jnp.sum(coords) + jnp.sum(rot_grip), None

        total, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_inner))
        return total

    int(repeat_act(params, vox, proprio, lang))  # warmup/compile
    dt = timed_min(lambda: int(repeat_act(params, vox, proprio, lang)), rt)
    per_act = dt / n_inner

    # candidate conv lowerings (round 5): full-MXU tap packing for the
    # final 128->64 conv, and the same lowering extended through up0's k5
    # convs. Param-tree compatible with the default net, so the same
    # params measure all three. Exactness: test_conv3d_pallas.py.
    variant_ms = {}
    for key, be, ube in (("packed", "conv2d_packed", "xla"),
                         ("packed_up0", "conv2d_packed", "conv2d_packed")):
        vcfg = dataclasses.replace(cfg, conv_backend=be,
                                   upsample_conv_backend=ube)
        vnet = PerceiverIO(vcfg)

        @jax.jit
        def repeat_v(params, vox, proprio, lang, _vnet=vnet):
            def body(carry, i):
                q_trans, q_rot_grip, q_coll = _vnet.apply(
                    params, vox + i.astype(vox.dtype) * 1e-6, proprio, lang)
                coords, rot_grip, coll = choose_highest_action(
                    q_trans, q_rot_grip, q_coll)
                return carry + jnp.sum(coords) + jnp.sum(rot_grip), None
            total, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_inner))
            return total

        try:
            int(repeat_v(params, vox, proprio, lang))
            vdt = timed_min(
                lambda: int(repeat_v(params, vox, proprio, lang)), rt)
            variant_ms[key] = vdt / n_inner * 1000.0
        except Exception:
            variant_ms[key] = -1.0
    # single-call p50 (includes the unavoidable dispatch round trip)
    single = jax.jit(lambda p, v, pr, l: choose_highest_action(
        *net.apply(p, v, pr, l)))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        c, rg, cl = single(params, vox, proprio, lang)
        int(jnp.sum(c) + jnp.sum(rg))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    # pipelined serving p50: a control loop issues single-action dispatches
    # back-to-back (jax dispatch is async), fetching results as they land.
    # In steady state the per-action latency is the device step time — the
    # dispatch round trip overlaps the previous action's compute. This is
    # the number a deployment pays per action once >1 request is in flight
    # (and what a local host pays even at depth 1: its dispatch is ~1 ms,
    # not this sandbox tunnel's ~25 ms).
    k = 12
    outs = [single(params, vox, proprio, lang) for _ in range(2)]  # prime
    t0 = time.perf_counter()
    outs = [single(params, vox, proprio, lang) for _ in range(k)]
    int(jnp.sum(outs[-1][0]) + jnp.sum(outs[-1][1]))
    piped = (time.perf_counter() - t0 - rt) / k
    return (1.0 / per_act, per_act * 1000.0, lat[len(lat) // 2] * 1000.0,
            piped * 1000.0, variant_ms)


def bench_serve_pipeline(jax, rt: float, n_inner: int = 8,
                         dtype: str = "bfloat16"):
    """Full serving step: point cloud -> voxelize -> PerceiverIO -> action
    decode, as ONE jitted graph (the val_real_camera_prev.py loop body)."""
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.models import PerceiverConfig, PerceiverIO
    from real_robot_nerf_actor_tpu.ops import (VoxelizerSpec,
                                               choose_highest_action, voxelize)

    cfg = PerceiverConfig(depth=6, voxel_size=100, num_latents=2048,
                          latent_dim=512, compute_dtype=dtype)
    spec = VoxelizerSpec(voxel_size=100, feature_size=3,
                         max_num_coords=220000)
    bounds = jnp.asarray([-0.1, -0.3, -0.2, 0.8, 0.7, 0.7])
    net = PerceiverIO(cfg)
    pts = jax.random.uniform(jax.random.key(0), (1, spec.max_num_coords, 3),
                             minval=-0.2, maxval=0.8)
    cols = jax.random.uniform(jax.random.key(1), (1, spec.max_num_coords, 3),
                              minval=-1.0, maxval=1.0)
    proprio = jnp.zeros((1, cfg.low_dim_size))
    lang = jax.random.normal(jax.random.key(2),
                             (1, cfg.lang_max_seq_len, cfg.lang_emb_dim))
    vox0 = voxelize(pts, cols, bounds, spec)
    params = net.init(jax.random.key(3), vox0, proprio, lang)

    @jax.jit
    def rep(params, pts, cols, proprio, lang):
        def body(c, i):
            vox = voxelize(pts + i.astype(pts.dtype) * 1e-7, cols, bounds,
                           spec)
            coords, rot_grip, coll = choose_highest_action(
                *net.apply(params, vox, proprio, lang))
            return c + jnp.sum(coords) + jnp.sum(rot_grip), None
        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n_inner))
        return tot

    int(rep(params, pts, cols, proprio, lang))
    dt = timed_min(lambda: int(rep(params, pts, cols, proprio, lang)), rt)
    return dt / n_inner * 1000.0


def bench_serve_loop(jax, rt: float, dtype: str = "bfloat16"):
    """Served-loop latency measured THROUGH run_deployment (not a bench
    loop). Three numbers:

    - loop_p50_ms: p50 per-step wall with host-resident observations. On
      this sandbox each step ships a ~5.5 MB point cloud over the axon
      tunnel, so this is dominated by tunnel transfer + the ~25-40 ms
      dispatch round trip — costs a local robot host does not pay (PCIe
      moves 5.5 MB in <1 ms).
    - loop_device_ms: p50 per-step wall minus the dispatch round trip,
      with observations pre-staged on device (clouds pre-padded to
      max_num_coords so pad_point_cloud passes device slices through).
      This is the framework's actual per-action loop cost — what a local
      deployment pays per action (its dispatch is ~1 ms, not the tunnel's).
    - scan_ms_per_action: the device-side lax.scan horizon (_act_scan) on
      pre-staged inputs — replay validation at device speed.
    """
    import numpy as np
    from real_robot_nerf_actor_tpu.data.replay import ReplayRobotIO
    from real_robot_nerf_actor_tpu.data.synthetic import (
        make_replay_steps, make_synthetic_demo, make_synthetic_scene)
    from real_robot_nerf_actor_tpu.models import PerceiverConfig, PerceiverIO
    from real_robot_nerf_actor_tpu.ops import VoxelizerSpec
    from real_robot_nerf_actor_tpu.train.serve import (
        PolicyServer, ServeConfig, run_deployment, run_deployment_scan)
    import jax.numpy as jnp

    cfg = PerceiverConfig(depth=6, voxel_size=100, num_latents=2048,
                          latent_dim=512, compute_dtype=dtype)
    spec = VoxelizerSpec(voxel_size=100, feature_size=3,
                         max_num_coords=220000)
    net = PerceiverIO(cfg)
    variables = net.init(
        jax.random.key(0), jnp.zeros((1, 100, 100, 100, cfg.initial_dim)),
        jnp.zeros((1, cfg.low_dim_size)),
        jnp.zeros((1, cfg.lang_max_seq_len, cfg.lang_emb_dim)))
    lang = np.zeros((cfg.lang_max_seq_len, cfg.lang_emb_dim), np.float32)
    server = PolicyServer(ServeConfig(num_steps=20), cfg, spec, variables,
                          lang)
    scene = make_synthetic_scene(seed=0, n_points=200000)
    demo = make_synthetic_demo(scene)
    steps = make_replay_steps(scene, demo) * 4          # horizon 20
    robot = ReplayRobotIO(steps)
    run_deployment(server, robot, num_steps=2)          # compile + warm
    times = []
    robot2 = ReplayRobotIO(steps)
    for _ in range(12):
        t0 = time.perf_counter()
        run_deployment(server, robot2, num_steps=1)
        times.append(time.perf_counter() - t0)
    times.sort()
    loop_p50 = times[len(times) // 2] * 1000.0
    # device-resident variant: pre-pad each cloud to max_num_coords and
    # stage it on device; pad_point_cloud then passes device slices
    # through untouched and act() pays no host->device cloud transfer
    from real_robot_nerf_actor_tpu.data.replay import (PointCloudSample,
                                                       ReplayStep,
                                                       pad_point_cloud)
    dev_steps = []
    for s in steps:
        p, c, v = pad_point_cloud(s.observation, spec.max_num_coords)
        dev_steps.append(ReplayStep(
            PointCloudSample(jax.device_put(jnp.asarray(p)),
                             jax.device_put(jnp.asarray(c)),
                             valid=jax.device_put(jnp.asarray(v))),
            s.proprio_xyz, s.proprio_rot, s.proprio_grip))
    robot3 = ReplayRobotIO(dev_steps)
    run_deployment(server, robot3, num_steps=2)         # warm
    dtimes = []
    robot4 = ReplayRobotIO(dev_steps)
    for _ in range(12):
        t0 = time.perf_counter()
        run_deployment(server, robot4, num_steps=1)
        dtimes.append(time.perf_counter() - t0)
    dtimes.sort()
    # min, not p50: the loop pays one tunnel round trip per step and rt
    # jitters by +-10 ms on this link — additive transients, same
    # rationale as timed_min
    loop_device = max(dtimes[0] - rt, 0.0) * 1000.0
    # device-side scan horizon on pre-staged inputs (run_deployment_scan's
    # host pad/stack + 105 MB tunnel upload excluded: a local host pays
    # ~10 ms for it, the tunnel pays seconds)
    stack = lambda f: jnp.stack([f(s) for s in dev_steps])
    args = (server.variables,
            stack(lambda s: s.observation.points),
            stack(lambda s: s.observation.colors),
            stack(lambda s: s.observation.valid),
            stack(lambda s: jnp.asarray(s.proprio_xyz, jnp.float32)),
            stack(lambda s: jnp.asarray(s.proprio_rot, jnp.float32)),
            jnp.asarray([s.proprio_grip for s in dev_steps], jnp.float32),
            server.lang)
    out = server._act_scan(*args)                        # (T, 8) packed
    float(jnp.sum(out))                                  # compile + warm
    dt = timed_min(lambda: float(jnp.sum(server._act_scan(*args))), rt)
    scan_per_action = dt / len(dev_steps) * 1000.0
    return loop_p50, loop_device, scan_per_action


_LOCAL_OVERHEAD_SNIPPET = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from real_robot_nerf_actor_tpu.data.replay import ReplayRobotIO, \
    pad_point_cloud
from real_robot_nerf_actor_tpu.data.synthetic import (
    make_replay_steps, make_synthetic_demo, make_synthetic_scene)
from real_robot_nerf_actor_tpu.models import PerceiverConfig, PerceiverIO
from real_robot_nerf_actor_tpu.ops import VoxelizerSpec
from real_robot_nerf_actor_tpu.train.serve import (PolicyServer, ServeConfig,
                                                   run_deployment)

# tiny net (depth 1, 64 latents, 50^3 grid) so the CPU forward is fast:
# the device compute is SUBTRACTED out below — only the loop's host-side
# work (capture, pad_point_cloud on the real 220k cloud, proprio packing,
# trace building, the local dispatch) is being measured, and none of it
# depends on the voxel resolution. The CLOUD size stays the real 220k.
cfg = PerceiverConfig(depth=1, voxel_size=50, num_latents=64,
                      latent_dim=128)
spec = VoxelizerSpec(voxel_size=50, feature_size=3, max_num_coords=220000)
net = PerceiverIO(cfg)
variables = net.init(
    jax.random.key(0), jnp.zeros((1, 50, 50, 50, cfg.initial_dim)),
    jnp.zeros((1, cfg.low_dim_size)),
    jnp.zeros((1, cfg.lang_max_seq_len, cfg.lang_emb_dim)))
lang = np.zeros((cfg.lang_max_seq_len, cfg.lang_emb_dim), np.float32)
server = PolicyServer(ServeConfig(num_steps=20), cfg, spec, variables, lang)
scene = make_synthetic_scene(seed=0, n_points=200000)
steps = make_replay_steps(scene, make_synthetic_demo(scene)) * 4
robot = ReplayRobotIO(steps)
run_deployment(server, robot, num_steps=2)            # compile + warm
# Time the loop's HOST-SIDE terms directly (capture, the 220k-point
# pad_point_cloud, proprio packing, move/trace) rather than subtracting
# act() from a whole loop step: on a slow/contended CPU the forward is
# tens of seconds and differencing two huge noisy numbers buries the
# few-ms signal (a first cut of this bench reported 1.0-1.8 s of
# "overhead" that was pure subtraction noise). The device dispatch term
# is reported separately by serve_loop_device_ms on the TPU.
robot2 = ReplayRobotIO(steps)
host = []
acts = []
for t in range(12):
    t0 = time.perf_counter()
    obs = robot2.capture_pointcloud()
    pts, cols, valid = pad_point_cloud(obs, spec.max_num_coords)
    xyz_p, rot_p, grip_p = robot2.get_proprio()
    t1 = time.perf_counter()
    xyz, rot_deg, grip, coll = server.act(pts, cols, valid, xyz_p, rot_p,
                                          grip_p)
    t2 = time.perf_counter()
    action = {"step": t, "xyz": xyz, "rotation": rot_deg,
              "gripper_open": grip, "ignore_collision": coll}
    robot2.move_to(xyz, rot_deg, float(grip))
    t3 = time.perf_counter()
    host.append((t1 - t0) + (t3 - t2))
    acts.append(t2 - t1)
host.sort()
acts.sort()
print(json.dumps({
    "act_p50_ms": acts[len(acts) // 2] * 1000.0,
    "overhead_ms": host[len(host) // 2] * 1000.0,
}))
"""


def bench_serve_local_overhead():
    """Round-4 VERDICT #8: measure (don't extrapolate) the host-side cost of
    the full run_deployment loop machinery on a LOCAL device. A subprocess
    pinned to the CPU backend (no axon tunnel) runs the deployment-loop
    body with host-resident observations and times its host-side terms
    directly — robot capture, the 220k-point pad_point_cloud, proprio
    packing, trace building/move — i.e. what a local robot host pays ON
    TOP of the device step. The local-host p50 claim is then
    serve_loop_device_ms (TPU compute) + this overhead, both measured.
    Reference analog: val_real_camera_prev.py:811-876's per-step host work.
    """
    import json as _json
    import os
    import subprocess
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", _LOCAL_OVERHEAD_SNIPPET], env=env,
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    line = out.stdout.strip().splitlines()[-1]
    return _json.loads(line)["overhead_ms"]


def bench_voxelize(jax, rt: float, n_inner: int = 20):
    """BASELINE config 2: fused multi-cam point cloud -> 100^3 feature grid."""
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.ops import VoxelizerSpec, voxelize

    spec = VoxelizerSpec(voxel_size=100, feature_size=3,
                         max_num_coords=220000)
    bounds = jnp.asarray([-0.1, -0.3, -0.2, 0.8, 0.7, 0.7])
    pts = jax.random.uniform(jax.random.key(0), (1, spec.max_num_coords, 3),
                             minval=-0.2, maxval=0.8)
    cols = jax.random.uniform(jax.random.key(1), (1, spec.max_num_coords, 3),
                              minval=-1.0, maxval=1.0)

    @jax.jit
    def rep(pts, cols):
        def body(c, i):
            vox = voxelize(pts + i.astype(pts.dtype) * 1e-7, cols, bounds,
                           spec)
            return c + jnp.sum(vox[..., -1]), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n_inner))
        return tot

    float(rep(pts, cols))
    dt = timed_min(lambda: float(rep(pts, cols)), rt) / n_inner
    return 1.0 / dt


def main():
    jax = _setup()
    rt = measure_rt_overhead(jax)
    # parity config: the reference's exact sampling/arch budgets
    # (64+32+16 samples/ray), served through the fused bf16 Pallas
    # pipeline (same math as the XLA path to bf16 rounding —
    # tolerance-tested; see BENCH_NOTES round 2). Reported as
    # parity_rays_per_sec; the HEADLINE below is the serving default.
    rays_per_sec = bench_nerf_render(jax, rt, mlp_backend="pallas_bf16")
    # the pure-XLA lowering of the same config, for the record
    try:
        xla_rays = bench_nerf_render(jax, rt)
    except Exception:
        xla_rays = 0.0
    # perf mode: proposal sampler (opt-in feature, NOT the parity config)
    try:
        proposal_rays = bench_nerf_render(jax, rt, proposal=True)
    except Exception:
        proposal_rays = 0.0
    # faster perf mode: latent-free proposal (no grid gather on coarse)
    try:
        proposal_nolat_rays = bench_nerf_render(jax, rt, proposal=True,
                                                proposal_use_latent=False)
    except Exception:
        proposal_nolat_rays = 0.0
    # serving throughput: 2 frames in flight (identical per-ray math)
    try:
        batched_rays = bench_nerf_render(jax, rt, n_frames=2, n_inner=4)
    except Exception:
        batched_rays = 0.0
    # int8 serving mode: fused Pallas W8A8 ResnetFC (parity architecture,
    # quantized numerics — an opt-in like the proposal sampler)
    try:
        int8_rays = bench_nerf_render(jax, rt, mlp_backend="pallas_int8")
    except Exception:
        int8_rays = 0.0
    # occupancy sample compaction (opt-in; real table-top occupancy from
    # the voxelized synthetic kitchen): parity budgets first, then the
    # compact serving config (24+16 occupancy-placed samples + int8 MLP)
    try:
        occ_rays = bench_nerf_render(jax, rt, occupancy=True,
                                     mlp_backend="pallas_bf16")
    except Exception:
        occ_rays = 0.0
    try:
        occ_serve_rays = bench_nerf_render(
            jax, rt, occupancy=True, mlp_backend="pallas_int8",
            n_coarse=24, n_fine=16, n_fine_depth=0, n_inner=16)
    except Exception:
        occ_serve_rays = 0.0
    # culled serving frames (RayPlan active-ray compaction, the TPU analog
    # of per-ray early termination): rays that miss the occupied AABB are
    # dropped once per (scene, camera); rays/s counts the DELIVERED frame
    # (16384 pixels), cull_active_frac reports how many were computed.
    # Camera = the synthetic-kitchen serving viewpoint (measured ~31%
    # active on the tightened occupancy AABB; the recorded-kitchen eval
    # camera sits at ~83% — see cull_active_frac in quality.json rows).
    try:
        cull24_rays, cull_frac = bench_nerf_render(
            jax, rt, occupancy=True, mlp_backend="pallas_int8",
            n_coarse=24, n_fine=16, n_fine_depth=0, n_inner=16, cull=True)
    except Exception:
        cull24_rays, cull_frac = 0.0, 0.0
    try:
        cull16_rays, cull16_frac = bench_nerf_render(
            jax, rt, occupancy=True, mlp_backend="pallas_int8",
            n_coarse=16, n_fine=8, n_fine_depth=0, n_inner=16, cull=True)
    except Exception:
        cull16_rays, cull16_frac = 0.0, 0.0
    # static int8 activation scales on the serving default (round-4
    # VERDICT #3's named lever: dynamic per-row quant ate ~1/3 of the
    # int8 win). Quality gate: scripts/eval_quality.py occ_int8_cull16s
    # on the trained checkpoints, same discipline as every int8 delta.
    try:
        cull16s_rays, cull16s_frac = bench_nerf_render(
            jax, rt, occupancy=True, mlp_backend="pallas_int8",
            n_coarse=16, n_fine=8, n_fine_depth=0, n_inner=16, cull=True,
            static_act=True)
    except Exception:
        cull16s_rays, cull16s_frac = 0.0, 0.0
    try:
        cull12_rays, _ = bench_nerf_render(
            jax, rt, occupancy=True, mlp_backend="pallas_int8",
            n_coarse=12, n_fine=6, n_fine_depth=0, n_inner=16, cull=True)
    except Exception:
        cull12_rays = 0.0
    # gather-fused one-kernel serving path (EXACT vs unfused — the corner
    # gather + lerp DMA-pipeline behind the int8 MXU; round-4 VERDICT #3's
    # second named lever), alone and stacked with static act scales
    try:
        cull16gf_rays, cull16gf_frac = bench_nerf_render(
            jax, rt, occupancy=True, mlp_backend="pallas_int8",
            n_coarse=16, n_fine=8, n_fine_depth=0, n_inner=16, cull=True,
            gather_fused=True)
    except Exception:
        cull16gf_rays, cull16gf_frac = 0.0, 0.0
    try:
        cull16sgf_rays, cull16sgf_frac = bench_nerf_render(
            jax, rt, occupancy=True, mlp_backend="pallas_int8",
            n_coarse=16, n_fine=8, n_fine_depth=0, n_inner=16, cull=True,
            static_act=True, gather_fused=True)
    except Exception:
        cull16sgf_rays, cull16sgf_frac = 0.0, 0.0
    # the parity-series effect of the same kernel (same math as the
    # baseline estimate's 64+32+16 budgets, bf16 weights, uncompacted)
    try:
        parity_gf_rays = bench_nerf_render(jax, rt,
                                           mlp_backend="pallas_bf16",
                                           gather_fused=True)
    except Exception:
        parity_gf_rays = 0.0
    # the serving default on the EVAL camera geometry (80x60 @ 76.18,
    # ~83% of rays computed): the anti-flattering datapoint — what the
    # same config delivers where culling barely helps
    try:
        evalcam_rays, evalcam_frac = bench_nerf_render(
            jax, rt, occupancy=True, mlp_backend="pallas_int8",
            n_coarse=16, n_fine=8, n_fine_depth=0, n_inner=32, cull=True,
            camera="evalcam")
    except Exception:
        evalcam_rays, evalcam_frac = 0.0, 0.0
    (actions_per_sec, device_ms, e2e_p50_ms, piped_p50_ms,
     policy_variant_ms) = bench_policy(jax, rt)
    try:
        serve_loop_p50_ms, serve_loop_dev_ms, serve_scan_ms = \
            bench_serve_loop(jax, rt)
    except Exception:
        serve_loop_p50_ms, serve_loop_dev_ms, serve_scan_ms = 0.0, 0.0, 0.0
    try:
        serve_local_overhead_ms = bench_serve_local_overhead()
    except Exception:
        serve_local_overhead_ms = 0.0
    try:
        vox_per_sec = bench_voxelize(jax, rt)
    except Exception:
        vox_per_sec = 0.0
    try:
        serve_ms = bench_serve_pipeline(jax, rt)
    except Exception:
        serve_ms = 0.0
    # HEADLINE: the serving default (configs/serve.yaml — occupancy
    # compaction + fused int8 MLP with static act scales, 16+8 budgets,
    # RayPlan culling), quality-gated on TRAINED checkpoints: the round-4
    # gates held occ_int8_cull16 within 0.03 dB of fp32 on both round-4
    # flagships (artifacts/round4_flagship{,_ft}/quality.json), and the
    # round-5 multitask checkpoint gates the static-scales row within
    # 0.01 dB of dynamic / 0.08 dB of fp32 with holdout at parity
    # (artifacts/round5_multitask/quality_serving.json). Throughput counts
    # DELIVERED frame rays: culled rays (provably pure background, exact
    # on a mask_outside field) are delivered at plan cost only, so the
    # number is camera-dependent — cull_active_frac records the computed
    # fraction and headline_computed_rays_per_sec the camera-independent
    # computed-ray rate. The parity config's throughput stays recorded as
    # parity_rays_per_sec (the apples-to-apples series vs the baseline's
    # 64+48 stratified estimate). Falls back down the frontier if a mode
    # failed to run.
    # headline_frac: the computed-ray fraction OF THE HEADLINE RUN itself
    # (ADVICE r4: keying off the separate cull24 run's frac reported a
    # false 0 computed rate whenever cull24 failed but cull16 succeeded)
    if cull16s_rays > 0:
        headline, headline_cfg, headline_frac = cull16s_rays, \
            "serve.yaml occ+int8+cull 16+8 + static act scales " \
            "(quality-gated)", cull16s_frac
    elif cull16_rays > 0:
        headline, headline_cfg, headline_frac = cull16_rays, \
            "occ+int8+cull 16+8, dynamic quant (static mode failed)", \
            cull16_frac
    elif occ_serve_rays > 0:
        headline, headline_cfg, headline_frac = occ_serve_rays, \
            "occ+int8 24+16 (quality-gated; cull mode failed)", 1.0
    else:
        headline, headline_cfg, headline_frac = rays_per_sec, \
            "parity pallas_bf16 64+32+16 (serve modes failed)", 1.0
    print(json.dumps({
        # renamed from nerf_rays_per_sec (r1-r3): the headline measures the
        # SERVING config, not the parity config — parity_rays_per_sec below
        # is the apples-to-apples series vs BENCH_r01/r02 'value' (ADVICE r3)
        "metric": "serving_rays_per_sec",
        "value": round(headline, 1),
        "unit": "rays/s",
        "vs_baseline": round(headline / REFERENCE_RAYS_PER_SEC, 3),
        "headline_config": headline_cfg,
        "headline_computed_rays_per_sec":
            round(headline * headline_frac, 1),
        "serving_cull24_rays_per_sec": round(cull24_rays, 1),
        "serving_cull16_rays_per_sec": round(cull16_rays, 1),
        "serving_cull16_static_rays_per_sec": round(cull16s_rays, 1),
        "cull16_static_active_frac": round(cull16s_frac, 4),
        "serving_cull16_gf_rays_per_sec": round(cull16gf_rays, 1),
        "serving_cull16_static_gf_rays_per_sec": round(cull16sgf_rays, 1),
        "cull16_static_gf_active_frac": round(cull16sgf_frac, 4),
        "cull16_gf_computed_rays_per_sec":
            round(cull16gf_rays * cull16gf_frac, 1),
        "cull16_static_gf_computed_rays_per_sec":
            round(cull16sgf_rays * cull16sgf_frac, 1),
        "parity_gf_rays_per_sec": round(parity_gf_rays, 1),
        "serving_cull12_rays_per_sec": round(cull12_rays, 1),
        "cull_active_frac": round(cull_frac, 4),
        "serving_evalcam_rays_per_sec": round(evalcam_rays, 1),
        "evalcam_active_frac": round(evalcam_frac, 4),
        "parity_rays_per_sec": round(rays_per_sec, 1),
        "parity_vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC,
                                    3),
        "xla_rays_per_sec": round(xla_rays, 1),
        "proposal_mode_rays_per_sec": round(proposal_rays, 1),
        "proposal_nolat_rays_per_sec": round(proposal_nolat_rays, 1),
        "batched2_rays_per_sec": round(batched_rays, 1),
        "int8_rays_per_sec": round(int8_rays, 1),
        "occupancy_rays_per_sec": round(occ_rays, 1),
        "occupancy_serve_rays_per_sec": round(occ_serve_rays, 1),
        "policy_actions_per_sec": round(actions_per_sec, 2),
        "policy_device_ms": round(device_ms, 2),
        # round-5 candidate conv lowerings (exact, param-compatible):
        # full-MXU tap packing for the final conv / + up0's k5 convs
        "policy_device_ms_packed": round(policy_variant_ms["packed"], 2),
        "policy_device_ms_packed_up0": round(
            policy_variant_ms["packed_up0"], 2),
        "policy_p50_latency_ms": round(e2e_p50_ms, 2),
        "policy_pipelined_p50_ms": round(piped_p50_ms, 2),
        "voxelize_220k_clouds_per_sec": round(vox_per_sec, 2),
        "serve_pipeline_ms": round(serve_ms, 2),
        "serve_loop_p50_ms": round(serve_loop_p50_ms, 2),
        "serve_loop_device_ms": round(serve_loop_dev_ms, 2),
        "serve_scan_ms_per_action": round(serve_scan_ms, 2),
        # measured host-side cost of the run_deployment loop machinery on
        # a LOCAL (cpu) backend — no tunnel. The local-host per-action p50
        # claim = serve_loop_device_ms + this (both measured, no
        # extrapolation; round-4 VERDICT #8)
        "serve_loop_local_overhead_ms": round(serve_local_overhead_ms, 2),
        "serve_loop_local_p50_est_ms": round(
            serve_loop_dev_ms + serve_local_overhead_ms, 2),
        "dispatch_rt_ms": round(rt * 1000.0, 2),
    }))


if __name__ == "__main__":
    main()
