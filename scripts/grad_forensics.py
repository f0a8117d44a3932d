#!/usr/bin/env python
"""Gradient forensics for nonfinite-update bursts (BENCH_NOTES round 5).

The round-5 multitask fine-tunes produced bursts of nonfinite gradients
at bs=1/accum=1 (ft1/ft2 NaN'd; ft3 survived via OptimConfig.skip_nonfinite
but logged 631 dropped updates). This tool finds WHERE they come from.

Phase 1 (--mode replay): restore a mid-run checkpoint, replay the exact
training stream (data + per-step rng fast-forwarded to the checkpoint
step), and stash every batch whose gradient the nonfinite guard rejects
(opt_state.total_notfinite increments) together with the pre-step params.
Uses the production train_step unmodified, so the replay is the run.

Phase 2 (--mode dissect): for one stash, recompute per-loss-term
gradients (trans CE / rot+grip CE / aux trans CE / render) on the exact
(params, batch, rng) triple and report which parameter subtrees go
nonfinite under which term, plus forward-magnitude probes (logit spread,
voxel-feature range) — localizing the producing op.

Example (ft3 window):
  python scripts/grad_forensics.py --mode replay \
      --config configs/nerfact.yaml --multi-root datasets/multikitchen_r5b \
      --exclude-demos 3 --ckpt-dir artifacts/round5_multitask_ft3/ckpt \
      --replay-steps 1100 --out /tmp/gradf \
      -o renderer.image_width=80 -o renderer.image_height=60 \
      -o peract.voxelizer.max_num_coords=65536 \
      -o peract.model.aux_trans_head=true \
      -o peract.model.grip_proprio_scale=25 \
      -o peract.train.optim.accum_steps=1 -o peract.train.optim.lr=3e-5 \
      -o peract.train.optim.grad_clip=1.0 \
      -o peract.train.optim.schedule=cosine \
      -o peract.train.optim.warmup_steps=250 \
      -o peract.train.optim.decay_steps=12000
  python scripts/grad_forensics.py --mode dissect --stash /tmp/gradf/stash_step2716.npz [same config flags]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(args):
    from real_robot_nerf_actor_tpu.train import NerfActConfig, NerfActTrainer
    from real_robot_nerf_actor_tpu.utils.config import load_config
    from real_robot_nerf_actor_tpu.data.multitask import (
        load_multitask_entries)

    cfg = load_config(NerfActConfig, args.config, args.override)
    tr = NerfActTrainer(cfg)
    exclude = tuple(int(x) for x in args.exclude_demos.split(",") if x)
    entries = load_multitask_entries(args.multi_root, exclude_demos=exclude)
    return tr, entries


def flatten(tree, prefix=""):
    import jax
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        out[prefix + name] = leaf
    return out


def replay(args):
    import jax
    import numpy as np

    from real_robot_nerf_actor_tpu.train.trainer import CheckpointManager

    tr, entries = build(args)
    seed = tr.cfg.train.seed
    data = tr.multi_replay_data(entries, args.batch_size)
    mgr = CheckpointManager(args.ckpt_dir)
    from_step = (args.from_step if args.from_step is not None
                 else mgr.latest_step())
    assert from_step is not None, f"no checkpoint in {args.ckpt_dir}"

    # rng chain exactly as Trainer.run: key(seed) -> one init split ->
    # one split per loop iteration
    rng = jax.random.key(seed)
    rng, init_rng = jax.random.split(rng)
    state = mgr.restore(tr.init_state(init_rng), step=from_step)
    assert int(state.step) == from_step, (int(state.step), from_step)
    print(f"[replay] restored step {from_step} from {args.ckpt_dir}")
    for i in range(from_step):
        next(data)
        rng, _ = jax.random.split(rng)
    print(f"[replay] fast-forwarded {from_step} batches + rng splits")

    # donate OFF: the pre-step state must stay alive to stash it
    step_fn = jax.jit(tr.train_step)
    os.makedirs(args.out, exist_ok=True)
    tn_prev = float(state.opt_state.total_notfinite)
    stashed = 0
    events = []
    for step in range(from_step, from_step + args.replay_steps):
        batch = next(data)
        rng, step_rng = jax.random.split(rng)
        new_state, metrics = step_fn(state, batch, step_rng)
        tn = float(new_state.opt_state.total_notfinite)
        if tn > tn_prev:
            events.append(step)
            print(f"[replay] step {step}: NONFINITE grad "
                  f"(total {tn_prev:.0f} -> {tn:.0f}), "
                  f"loss={float(metrics['loss_total']):.3f}")
            if stashed < args.max_stash:
                path = os.path.join(args.out, f"stash_step{step}.npz")
                payload = {f"batch/{k}": np.asarray(v)
                           for k, v in batch.items()}
                payload.update({f"params/{k}": np.asarray(v) for k, v in
                                flatten(state.params).items()})
                payload.update({f"extra/{k}": np.asarray(v) for k, v in
                                flatten(state.extra).items()} if
                               state.extra is not None else {})
                payload["rng_key_data"] = np.asarray(
                    jax.random.key_data(step_rng))
                payload["step"] = np.asarray(step)
                np.savez_compressed(path, **payload)
                print(f"[replay] stashed pre-step params + batch -> {path}")
                stashed += 1
        elif (step + 1) % 50 == 0:
            print(f"[replay] step {step + 1} ok | "
                  f"loss={float(metrics['loss_total']):.3f} | skips={tn:.0f}")
        tn_prev = tn
        state = new_state
    with open(os.path.join(args.out, "events.json"), "w") as f:
        json.dump({"from_step": from_step, "events": events}, f)
    print(f"[replay] done: {len(events)} nonfinite steps in "
          f"[{from_step}, {from_step + args.replay_steps})")


def load_stash(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    tr, _ = build(args)
    z = np.load(args.stash)
    batch = {k[len("batch/"):]: jnp.asarray(v) for k, v in z.items()
             if k.startswith("batch/")}
    flat_params = {k[len("params/"):]: v for k, v in z.items()
                   if k.startswith("params/")}
    step_rng = jax.random.wrap_key_data(jnp.asarray(z["rng_key_data"]))
    print(f"[stash] step {int(z['step'])}, {len(flat_params)} param leaves")

    # rebuild the params pytree from flat paths using a template
    state_tpl = tr.init_state(jax.random.key(0))
    template = state_tpl.params
    tpl_flat = flatten(template)
    assert set(tpl_flat) == set(flat_params), "param structure mismatch"
    treedef = jax.tree_util.tree_structure(template)
    # tree_unflatten needs leaves in tree order, not sorted order
    leaves_tree_order = [jnp.asarray(flat_params[k])
                         for k in flatten(template)]
    params = jax.tree_util.tree_unflatten(treedef, leaves_tree_order)
    extra = state_tpl.extra  # flagship nerfact: no batch_stats ({} here)
    return tr, batch, params, extra, step_rng


def prep_inputs(tr, batch, step_rng):
    """The train_step's input pipeline (se3 aug -> voxelize), traced."""
    import jax
    import jax.numpy as jnp

    from real_robot_nerf_actor_tpu.ops.se3_aug import apply_se3_augmentation
    from real_robot_nerf_actor_tpu.ops.voxelize import voxelize

    c = tr.cfg
    k_aug, k_render = jax.random.split(step_rng)
    b = batch["points"].shape[0]

    def aug_one(key, pts, kf):
        return apply_se3_augmentation(
            key, pts[None], kf, tr.bounds,
            jnp.asarray(c.trans_aug_range), c.model.voxel_size,
            symmetric_clamp=c.se3_symmetric_clamp)

    assert c.use_se3_aug, "forensics expects use_se3_aug=true configs"
    keys = jax.random.split(k_aug, b)
    aug = jax.vmap(aug_one)(keys, batch["points"], batch["kf_xyz"])
    points = aug.pcd[:, 0]
    action_trans = aug.action_trans[:, 1]
    proprio_trans = aug.action_trans[:, 0]
    gt_pose = batch["gt_pose"].at[:, :3, 3].add(aug.shift)
    proprio = jnp.concatenate(
        [proprio_trans.astype(jnp.float32), batch["proprio"][:, 3:]],
        axis=-1)
    vox = voxelize(points, batch["colors"], tr.bounds, c.voxelizer,
                   valid=batch["valid"])
    return vox, proprio, action_trans, gt_pose, k_render


def probe(args):
    """Forward-intermediate sweep: find inf/NaN (and extreme magnitudes)
    in every module output — a dead-branch inf in the forward turns the
    zero cotangents of unrelated loss terms into NaN (0*inf) in backward,
    which is exactly the whole-leaf-NaN signature dissect reported."""
    import jax
    import numpy as np

    tr, batch, params, extra, step_rng = load_stash(args)

    def fwd(p):
        vox, proprio, _, _, _ = prep_inputs(tr, batch, step_rng)
        variables = {"params": p["policy"], **extra}
        out, mod_vars = tr.net.apply(
            variables, vox, proprio, batch["lang"], train=True,
            capture_intermediates=True,
            mutable=["intermediates", "batch_stats"])
        return out, mod_vars["intermediates"]

    out, inter = jax.jit(fwd)(params)
    rows = []
    for name, v in flatten(inter).items():
        v = np.asarray(v)
        if not np.issubdtype(v.dtype, np.floating):
            continue
        bad = int(np.size(v) - np.isfinite(v).sum())
        fin = v[np.isfinite(v)]
        rows.append((name, bad, float(np.abs(fin).max()) if fin.size else
                     float("nan"), str(v.dtype), v.size))
    rows.sort(key=lambda r: (-r[1], -r[2]))
    print(f"[probe] {len(rows)} float intermediates")
    for name, bad, mx, dt, size in rows[:30]:
        flag = " <-- NONFINITE" if bad else ""
        print(f"  {name}: bad={bad}/{size} max|finite|={mx:.3e} {dt}{flag}")


def mint(args):
    """Isolate the op whose BACKWARD mints the NaN: re-run the forward
    with capture_intermediates, reconstruct each candidate segment's exact
    inputs, and VJP each segment separately on those values. The dissect
    report shows head-param grads clean but every volume-cotangent
    (d0/dec/u) consumer NaN, so the suspects are the ops between them:
    spatial_softmax_3d, the trans-decoder convs, and the attention trunk."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from real_robot_nerf_actor_tpu.ops.spatial_softmax import (
        spatial_softmax_3d)

    tr, batch, params, extra, step_rng = load_stash(args)
    c = tr.cfg

    def fwd(p):
        vox, proprio, _, _, _ = prep_inputs(tr, batch, step_rng)
        variables = {"params": p["policy"], **extra}
        out, mod_vars = tr.net.apply(
            variables, vox, proprio, batch["lang"], train=True,
            capture_intermediates=True,
            mutable=["intermediates", "batch_stats"])
        return out, mod_vars["intermediates"]

    out, inter = jax.jit(fwd)(params)
    flat = {k: v for k, v in flatten(inter).items()}

    def get(name):
        return jnp.asarray(flat[name + "__call__/0"])

    d0 = get("encoder_3d/")
    dec_tokens = get("decoder_cross_attn/")      # (B, 77+s^3, 128)
    s = c.model.spatial_size
    b = d0.shape[0]
    dec = dec_tokens[:, c.model.lang_max_seq_len:].reshape(
        b, s, s, s, c.model.input_dim_before_seq)
    u0 = get("up0/")
    ufin = get("final/")

    def check(label, grads):
        ok = all(bool(jnp.all(jnp.isfinite(g))) for g in
                 jax.tree_util.tree_leaves(grads))
        mx = max(float(jnp.max(jnp.abs(g))) for g in
                 jax.tree_util.tree_leaves(grads))
        print(f"[mint] {label}: {'FINITE' if ok else 'NONFINITE <--'} "
              f"max|g|={mx:.3e}")
        return ok

    # 1) spatial softmax backward on the exact volumes
    for label, vol in (("ssm(d0)", d0), ("ssm(dec)", dec), ("ssm(u)", ufin)):
        g = jax.jit(jax.grad(lambda x: jnp.sum(spatial_softmax_3d(x))))(vol)
        check(label, g)
        # weighted sum too (the real cotangent is not uniform)
        k = jax.random.key(1)
        w = jax.random.normal(k, (vol.shape[0], vol.shape[-1] * 3))
        g = jax.jit(jax.grad(
            lambda x: jnp.sum(w * spatial_softmax_3d(x))))(vol)
        check(label + " (rand-weighted)", g)

    # 2) trans decoder conv backward on the exact u
    from real_robot_nerf_actor_tpu.models.blocks import ContractFirstConv3D
    tdec = ContractFirstConv3D(1, 3, None, dtype=jnp.dtype(c.model.compute_dtype))
    tvars = {"params": params["policy"]["trans_decoder"]}
    g = jax.jit(jax.grad(
        lambda x: jnp.sum(tdec.apply(tvars, x).astype(jnp.float32))))(ufin)
    check("trans_decoder(u)", g)

    # 3) decoder cross attention backward on reconstructed (seq, x)
    from real_robot_nerf_actor_tpu.models.perceiver import PreNormAttn
    lang_out = get("lang_preprocess/")
    patch = get("patchify/")
    pro = get("proprio_preprocess/")
    patch = jnp.concatenate(
        [patch, jnp.broadcast_to(pro[:, None, None, None, :],
                                 patch.shape[:-1] + (pro.shape[-1],))], -1)
    ins = patch.reshape(b, s ** 3, c.model.input_dim_before_seq)
    seq = (jnp.concatenate([lang_out, ins], axis=1)
           + params["policy"]["pos_encoding"])
    x = jnp.broadcast_to(params["policy"]["latents"][None],
                         (b,) + params["policy"]["latents"].shape)
    x = x + get("cross_attend/") ; x = x + get("cross_ff/")
    for i in range(c.model.depth):
        x = x + get(f"self_attn_{i}/") ; x = x + get(f"self_ff_{i}/")
    dt = jnp.dtype(c.model.compute_dtype)
    dca = PreNormAttn(c.model.cross_heads, c.model.cross_dim_head,
                      c.model.input_dim_before_seq, cross=True, dtype=dt,
                      use_flash=c.model.use_flash_attention)
    dvars = {"params": params["policy"]["decoder_cross_attn"]}
    recon = dca.apply(dvars, seq, x)
    err = float(jnp.max(jnp.abs(recon - dec_tokens)))
    print(f"[mint] decoder_cross_attn reconstruction err {err:.3e}")
    g = jax.jit(jax.grad(
        lambda sx: jnp.sum(dca.apply(dvars, sx[0], sx[1]))))((seq, x))
    check("decoder_cross_attn(seq,x)", g)

    # 3b) the big 77+s^3-token cross attention + its FF (untested above)
    from real_robot_nerf_actor_tpu.models.perceiver import PreNormFF
    x0 = jnp.broadcast_to(params["policy"]["latents"][None],
                          (b,) + params["policy"]["latents"].shape)
    ca = PreNormAttn(c.model.cross_heads, c.model.cross_dim_head,
                     c.model.latent_dim, cross=True, dtype=dt,
                     use_flash=c.model.use_flash_attention)
    cvars = {"params": params["policy"]["cross_attend"]}
    g = jax.jit(jax.grad(
        lambda sx: jnp.sum(ca.apply(cvars, sx[1], sx[0]))))((seq, x0))
    check("cross_attend(x0,seq)", g)
    x1 = x0 + get("cross_attend/")
    cff = PreNormFF(c.model.latent_dim, dtype=dt)
    cfv = {"params": params["policy"]["cross_ff"]}
    g = jax.jit(jax.grad(lambda x_: jnp.sum(cff.apply(cfv, x_))))(x1)
    check("cross_ff(x)", g)

    # 3c) decoder-side convs: up0(dec), final(concat), encoder(vox)
    from real_robot_nerf_actor_tpu.models.blocks import (
        Conv3DBlock, Conv3DUpsampleBlock, MultiLayer3DEncoderShallow)
    up = Conv3DUpsampleBlock(c.model.final_dim, c.model.voxel_patch_size,
                             c.model.voxel_patch_size, c.model.activation,
                             dtype=dt, mode=c.model.upsample_mode)
    uvars = {"params": params["policy"]["up0"]}
    g = jax.jit(jax.grad(lambda d_: jnp.sum(
        up.apply(uvars, d_).astype(jnp.float32))))(dec)
    check("up0(dec)", g)
    fin = Conv3DBlock(c.model.im_channels, 3, 1, c.model.activation,
                      dtype=dt, padding=c.model.conv_padding,
                      backend=c.model.conv_backend)
    fvars2 = {"params": params["policy"]["final"]}
    cat = jnp.concatenate([d0, u0], axis=-1)
    g = jax.jit(jax.grad(lambda z_: jnp.sum(
        fin.apply(fvars2, z_).astype(jnp.float32))))(cat)
    check("final(concat(d0,u0))", g)
    vox, _, _, _, _ = jax.jit(
        lambda: prep_inputs(tr, batch, step_rng))()
    enc = MultiLayer3DEncoderShallow(c.model.im_channels)
    evars = {"params": params["policy"]["encoder_3d"],
             **{k: v["encoder_3d"] for k, v in extra.items()
                if "encoder_3d" in v}}
    g = jax.jit(jax.grad(lambda v_: jnp.sum(enc.apply(
        evars, v_, train=True, mutable=["batch_stats"])[0]
        .astype(jnp.float32))))(vox)
    check("encoder_3d(vox) [train BN]", g)

    # 3d) combined-network backward WITHOUT losses/renderer: if this is
    # already nonfinite while every isolated segment above is finite, the
    # minting is a property of the full compiled backward program
    def head_sum(p):
        vox, proprio, _, _, _ = prep_inputs(tr, batch, step_rng)
        out, _ = tr._forward(p["policy"], extra, vox, proprio,
                             batch["lang"], train=True)
        total = sum(jnp.sum(o.astype(jnp.float32)) for o in out[:3])
        if c.model.aux_trans_head:
            total = total + jnp.sum(out[4].astype(jnp.float32))
        return total

    g = jax.jit(jax.grad(head_sum))(params)
    check("FULL network backward (head sums, no losses)", g["policy"])

    # 3e) real CE losses, NO renderer in the program
    from real_robot_nerf_actor_tpu.ops.action_codec import DiscreteAction
    from real_robot_nerf_actor_tpu.train.peract import bc_losses

    def bc_only(p):
        vox, proprio, action_trans, _, _ = prep_inputs(tr, batch, step_rng)
        out, _ = tr._forward(p["policy"], extra, vox, proprio,
                             batch["lang"], train=True)
        action = DiscreteAction(trans=action_trans,
                                rot_grip=batch["rot_grip"],
                                collision=batch["collision"])
        total, _ = bc_losses(
            out[0], out[1], out[2], action, c.model.voxel_size,
            c.model.num_rotation_classes,
            q_trans_aux=out[4] if c.model.aux_trans_head else None,
            patch_size=c.model.voxel_patch_size,
            lambda_aux=c.lambda_aux_trans,
            trans_smooth=c.trans_label_smooth)
        return total

    g = jax.jit(jax.grad(bc_only))(params)
    check("bc losses backward (NO renderer)", g["policy"])

    # 4) one self-attn + ff block backward on the exact latent stream
    xb = jnp.broadcast_to(params["policy"]["latents"][None],
                          (b,) + params["policy"]["latents"].shape)
    xb = xb + get("cross_attend/") ; xb = xb + get("cross_ff/")
    for i in range(c.model.depth):
        sa = PreNormAttn(c.model.latent_heads, c.model.latent_dim_head,
                         c.model.latent_dim, dtype=dt,
                         use_flash=c.model.use_flash_attention)
        svars = {"params": params["policy"][f"self_attn_{i}"]}
        g = jax.jit(jax.grad(
            lambda x_: jnp.sum(sa.apply(svars, x_))))(xb)
        ok_a = check(f"self_attn_{i}(x)", g)
        xb = xb + get(f"self_attn_{i}/")
        ff = PreNormFF(c.model.latent_dim, dtype=dt)
        fvars = {"params": params["policy"][f"self_ff_{i}"]}
        g = jax.jit(jax.grad(
            lambda x_: jnp.sum(ff.apply(fvars, x_))))(xb)
        check(f"self_ff_{i}(x)", g)
        xb = xb + get(f"self_ff_{i}/")


def dissect(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from real_robot_nerf_actor_tpu.ops.action_codec import DiscreteAction
    from real_robot_nerf_actor_tpu.train.peract import bc_losses

    tr, batch, params, extra, step_rng = load_stash(args)
    c = tr.cfg
    jc = tr.jcfg

    TERMS = ("loss_trans", "loss_rot_grip", "loss_trans_aux", "loss_render")

    def loss_terms(p):
        # mirrors NerfActTrainer.train_step loss_fn (train/nerfact.py:69)
        vox, proprio, action_trans, gt_pose, k_render = prep_inputs(
            tr, batch, step_rng)
        out, _ = tr._forward(p["policy"], extra, vox, proprio,
                             batch["lang"], train=True)
        q_trans, q_rot_grip, q_coll, voxel_feat = out[:4]
        action = DiscreteAction(trans=action_trans,
                                rot_grip=batch["rot_grip"],
                                collision=batch["collision"])
        _, metrics = bc_losses(
            q_trans, q_rot_grip, q_coll, action, c.model.voxel_size,
            c.model.num_rotation_classes,
            q_trans_aux=out[4] if c.model.aux_trans_head else None,
            patch_size=c.model.voxel_patch_size,
            lambda_aux=c.lambda_aux_trans,
            trans_smooth=c.trans_label_smooth)
        render_loss, rmetrics = tr.renderer.rendering_loss(
            {"params": p["nerf"]}, voxel_feat[:1], batch["gt_rgb"][:1],
            gt_pose[:1], batch["focal"][0], k_render,
            gt_embed=batch.get("gt_embed"), gt_depth=batch.get("gt_depth"))
        metrics.update(rmetrics)
        terms = jnp.stack([metrics.get(t, jnp.float32(0.0)) for t in TERMS])
        probes = jnp.stack([
            jnp.max(jnp.abs(q_trans)), jnp.max(jnp.abs(q_rot_grip)),
            jnp.max(jnp.abs(voxel_feat)),
            jnp.max(jnp.abs(out[4])) if c.model.aux_trans_head
            else jnp.float32(0.0)])
        return terms, probes

    # ONE compiled program: gradient of a w-weighted term sum; one-hot w
    # isolates each term without materializing 4 full gradients at once
    # (a jacrev over all terms OOMs HBM at 100^3 flagship scale)
    print("[dissect] compiling weighted-term gradient (fresh program)...")
    grad_fn = jax.jit(jax.grad(
        lambda p, w: jnp.sum(w * loss_terms(p)[0]), argnums=0))
    fwd = jax.jit(loss_terms)
    terms, probes = fwd(params)
    terms = np.asarray(terms)
    probes = np.asarray(probes)
    jac = {t: grad_fn(params, jnp.zeros(len(TERMS)).at[i].set(1.0))
           for i, t in enumerate(TERMS)}
    print(f"[dissect] loss terms: "
          + ", ".join(f"{t}={v:.3f}" for t, v in zip(TERMS, terms)))
    print(f"[dissect] forward probes: max|q_trans|={probes[0]:.1f} "
          f"max|q_rot_grip|={probes[1]:.1f} max|voxel_feat|={probes[2]:.1f} "
          f"max|q_trans_aux|={probes[3]:.1f}")

    report = {}
    for t in TERMS:
        for name, gi in flatten(jac[t]).items():
            gi = np.asarray(gi)
            bad = int(np.size(gi) - np.isfinite(gi).sum())
            if bad:
                fin = gi[np.isfinite(gi)]
                report.setdefault(t, []).append(
                    (name, bad, float(np.abs(fin).max()) if fin.size else 0))
    if not report:
        print("[dissect] NO nonfinite per-term gradients — the combined "
              "backward must interact (run with --combined to check)")
    for t, rows in report.items():
        rows.sort(key=lambda r: -r[1])
        print(f"[dissect] term {t}: {len(rows)} leaves nonfinite")
        for name, bad, mx in rows[:12]:
            print(f"    {name}: {bad} bad, max|finite|={mx:.3e}")
    out = {t: [(n, b, m) for n, b, m in rows] for t, rows in report.items()}
    with open(args.stash.replace(".npz", "_dissect.json"), "w") as f:
        json.dump({"terms": {t: float(v) for t, v in zip(TERMS, terms)},
                   "probes": probes.tolist(), "nonfinite": out}, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["replay", "dissect", "probe", "mint"],
                    required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("-o", "--override", action="append", default=[])
    ap.add_argument("--multi-root", required=True)
    ap.add_argument("--exclude-demos", default="")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--from-step", type=int, default=None)
    ap.add_argument("--replay-steps", type=int, default=1000)
    ap.add_argument("--max-stash", type=int, default=2)
    ap.add_argument("--out", default="/tmp/gradf")
    ap.add_argument("--stash", default=None)
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    if args.mode == "replay":
        assert args.ckpt_dir, "--mode replay needs --ckpt-dir"
        replay(args)
    else:
        assert args.stash, f"--mode {args.mode} needs --stash"
        {"dissect": dissect, "probe": probe, "mint": mint}[args.mode](args)


if __name__ == "__main__":
    main()
