"""Multi-kitchen multi-task flagship pipeline (round 5).

Reference behavior: /root/reference/train_nerfact_multi_kitchen.py:1080-1260
trains jointly over 2 kitchens x 3 tasks x 5 demos with per-task CLIP
instruction embeddings feeding the PerceiverIO language tokens (:790-795).
Covered here: the dataset writer's task grid + shared home keyframe, the
manifest/lang loading, the multi-source training generator, the per-task
eval closure with the zero-lang ablation, and the aux-coarse-head /
label-smoothing loss knobs.
"""
import json
import os

import numpy as np
import pytest

from real_robot_nerf_actor_tpu.data.kitchen import write_multi_kitchen_dataset
from real_robot_nerf_actor_tpu.data.multitask import load_multitask_entries
from real_robot_nerf_actor_tpu.data.replay import ReplaySource


@pytest.fixture(scope="module")
def multiroot(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("multikitchen"))
    write_multi_kitchen_dataset(d, n_kitchens=2, n_tasks=3, n_demos=2,
                                image_hw=(24, 32), focal=30.0, d_embed=8,
                                n_points=4000)
    return d


def test_manifest_and_lang(multiroot):
    with open(os.path.join(multiroot, "manifest.json")) as f:
        m = json.load(f)
    assert len(m["entries"]) == 6
    lang = np.load(os.path.join(multiroot, "lang_embs.npz"))["embs"]
    assert lang.shape == (3, 77, 512)
    # distinct instructions -> well-separated token embeddings
    for a in range(3):
        for b in range(a + 1, 3):
            assert np.abs(lang[a] - lang[b]).max() > 0.1


def test_shared_home_keyframe(multiroot):
    """k0 is bit-identical across tasks of one (kitchen, demo): the first
    transition is decodable ONLY through the language tokens (the property
    the zero-lang ablation certifies)."""
    s0 = ReplaySource(os.path.join(multiroot, "k0_t0"), 2)
    s1 = ReplaySource(os.path.join(multiroot, "k0_t1"), 2)
    s2 = ReplaySource(os.path.join(multiroot, "k0_t2"), 2)
    for d in range(2):
        p0, p1, p2 = (s.pointcloud(d, 0) for s in (s0, s1, s2))
        np.testing.assert_array_equal(p0.points, p1.points)
        np.testing.assert_array_equal(p0.points, p2.points)
        x0, _, g0 = s0.pose(d, 0)
        x1, _, g1 = s1.pose(d, 0)
        np.testing.assert_allclose(x0, x1, atol=1e-3)  # mm txt roundtrip
        assert g0 == g1
    # but the TARGETS at k1 differ per task
    t0 = s0.pose(0, 1)[0]
    t1 = s1.pose(0, 1)[0]
    assert np.linalg.norm(t0 - t1) > 0.05


def test_kitchens_differ(multiroot):
    a = ReplaySource(os.path.join(multiroot, "k0_t0"), 1)
    b = ReplaySource(os.path.join(multiroot, "k1_t0"), 1)
    assert np.abs(a.pointcloud(0, 0).points
                  - b.pointcloud(0, 0).points).max() > 0.01
    assert np.abs(a.gt_pose - b.gt_pose).max() > 0.01


def test_no_state_aliased_transitions(multiroot):
    """No two transitions of one demo may share (near-identical position,
    same grip) inputs while pointing at far-apart targets: with a static
    scene that pair is undecidable from the observation, and the policy
    resolves it by always predicting one of the two targets. Round-5
    forensics caught exactly this in the press task (approach at box+0.15
    and post-press lift at box+0.15, both grip 0 -> the press keyframe
    decoded as 'home', a ~52-voxel miss on every demo; fixed by lifting
    to +0.25)."""
    for sub in ("k0_t0", "k0_t1", "k0_t2"):
        src = ReplaySource(os.path.join(multiroot, sub), 2)
        for d in range(2):
            demo = src.demos[d]
            nk = demo.num_keyframes
            for i in range(nk - 1):
                for j in range(i + 1, nk - 1):
                    same_in = (np.linalg.norm(demo.xyz[i] - demo.xyz[j])
                               < 0.05 and demo.gripper_open[i]
                               == demo.gripper_open[j])
                    far_out = np.linalg.norm(
                        demo.xyz[i + 1] - demo.xyz[j + 1]) > 0.10
                    assert not (same_in and far_out), (
                        f"{sub} d{d}: transitions k{i} and k{j} are "
                        f"state-aliased (inputs {demo.xyz[i]} ~ "
                        f"{demo.xyz[j]}, targets "
                        f"{np.linalg.norm(demo.xyz[i+1] - demo.xyz[j+1]):.2f}"
                        " m apart)")


def _tiny_entries(multiroot, exclude=()):
    entries = load_multitask_entries(multiroot, exclude_demos=exclude)
    rng = np.random.default_rng(0)
    tiny_lang = {t: rng.standard_normal((4, 16)).astype(np.float32)
                 for t in range(3)}
    for e in entries:
        e["lang"] = tiny_lang[e["task"]]
    return entries


def test_multi_replay_training_step(multiroot):
    import jax
    from tests.test_kitchen_replay import _tiny_nerfact

    tr = _tiny_nerfact(multiroot)
    entries = _tiny_entries(multiroot, exclude=(1,))
    data = tr.multi_replay_data(entries, batch_size=2, seed=0)
    batch = next(data)
    assert batch["points"].shape[0] == 2
    assert batch["lang"].shape == (2, 4, 16)
    assert batch["gt_rgb"].shape == (2, 24, 32, 3)
    assert batch["gt_pose"].shape == (2, 4, 4)
    state = tr.init_state(jax.random.key(0))
    state, metrics = jax.jit(tr.train_step)(state, batch, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_multi_eval_reports_per_task_and_zerolang(multiroot):
    import jax
    from tests.test_kitchen_replay import _tiny_nerfact

    tr = _tiny_nerfact(multiroot)
    entries = _tiny_entries(multiroot, exclude=(1,))
    eval_fn = tr.make_multi_replay_eval(entries)
    state = tr.init_state(jax.random.key(0))
    m = eval_fn(state, 0)
    for key in ("eval_psnr", "eval_psnr_holdout", "bc_train_exact",
                "bc_holdout_exact", "bc_t0_exact", "bc_t1_exact",
                "bc_t2_exact", "bc_zerolang_exact", "bc_score",
                "bc_render_score"):
        assert key in m, (key, sorted(m))
    # 2 kitchens x 3 tasks x 1 train demo x (nk-1=4) transitions
    assert m["bc_train_exact"] >= 0.0
    assert np.isfinite(m["bc_render_score"])


def test_aux_head_and_label_smoothing():
    """Both k3-retreat levers run and produce finite losses; smoothing at
    epsilon=0 matches the plain CE exactly."""
    import jax
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.ops.action_codec import DiscreteAction
    from real_robot_nerf_actor_tpu.train.peract import bc_losses

    rng = np.random.default_rng(0)
    v, r = 10, 6
    q_trans = jnp.asarray(rng.standard_normal((2, v, v, v)), jnp.float32)
    q_rg = jnp.asarray(rng.standard_normal((2, 3 * r + 2)), jnp.float32)
    q_c = jnp.asarray(rng.standard_normal((2, 2)), jnp.float32)
    action = DiscreteAction(
        trans=jnp.asarray([[0, 5, 9], [3, 3, 3]]),
        rot_grip=jnp.asarray([[1, 2, 3, 1], [0, 0, 0, 0]]),
        collision=jnp.asarray([[0], [1]]))
    base, _ = bc_losses(q_trans, q_rg, q_c, action, v, r)
    sm0, _ = bc_losses(q_trans, q_rg, q_c, action, v, r, trans_smooth=0.0)
    assert float(base) == float(sm0)
    sm, _ = bc_losses(q_trans, q_rg, q_c, action, v, r, trans_smooth=0.2)
    assert np.isfinite(float(sm)) and float(sm) != float(base)
    q_aux = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    tot, metrics = bc_losses(q_trans, q_rg, q_c, action, v, r,
                             q_trans_aux=q_aux, patch_size=5, lambda_aux=0.7)
    assert "loss_trans_aux" in metrics
    assert float(tot) == pytest.approx(
        float(base) + 0.7 * float(metrics["loss_trans_aux"]), rel=1e-5)


def test_z_loss_bounds_logit_scale():
    """z_loss=0 matches plain CE exactly; z_loss>0 adds mean(log^2 Z) and
    its gradient pushes the logit scale DOWN (round-5 forensics: unbounded
    trans logits overflowed the bs=1 backward -> inf grads)."""
    import jax
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.ops.action_codec import DiscreteAction
    from real_robot_nerf_actor_tpu.train.peract import bc_losses

    rng = np.random.default_rng(1)
    v, r = 10, 6
    q_trans = jnp.asarray(rng.standard_normal((2, v, v, v)), jnp.float32)
    q_rg = jnp.asarray(rng.standard_normal((2, 3 * r + 2)), jnp.float32)
    q_c = jnp.asarray(rng.standard_normal((2, 2)), jnp.float32)
    action = DiscreteAction(
        trans=jnp.asarray([[0, 5, 9], [3, 3, 3]]),
        rot_grip=jnp.asarray([[1, 2, 3, 1], [0, 0, 0, 0]]),
        collision=jnp.asarray([[0], [1]]))
    base, m0 = bc_losses(q_trans, q_rg, q_c, action, v, r)
    z0, mz0 = bc_losses(q_trans, q_rg, q_c, action, v, r, z_loss=0.0)
    assert float(base) == float(z0) and "loss_z" not in mz0
    zt, mz = bc_losses(q_trans, q_rg, q_c, action, v, r, z_loss=1e-3)
    assert "loss_z" in mz and float(mz["loss_z"]) > 0
    assert float(zt) == pytest.approx(
        float(base) + float(mz["loss_z"]), rel=1e-5)

    # gradient direction: on uniformly SHIFTED logits (log Z = shift +
    # const), the z-term's gradient wrt the shift is positive -> pushes
    # the scale down; total loss grows with the shift under z_loss
    def tot(shift, zl):
        t, _ = bc_losses(q_trans + shift, q_rg + shift, q_c, action, v, r,
                         z_loss=zl)
        return t
    g_plain = jax.grad(tot)(50.0, 0.0)
    g_z = jax.grad(tot)(50.0, 1e-2)
    assert abs(float(g_plain)) < 1e-4      # CE is shift-invariant
    assert float(g_z) > 1.0                # z-loss is not: pulls scale down


def test_aux_head_model_output():
    import jax
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.models import PerceiverConfig, PerceiverIO

    cfg = PerceiverConfig(depth=1, voxel_size=10, num_latents=8,
                          latent_dim=16, im_channels=8, cross_dim_head=8,
                          latent_dim_head=8, latent_heads=2,
                          voxel_patch_size=5, final_dim=8, lang_emb_dim=16,
                          lang_max_seq_len=4, aux_trans_head=True,
                          return_voxel_feat=True)
    net = PerceiverIO(cfg)
    vox = jnp.zeros((1, 10, 10, 10, cfg.initial_dim))
    proprio = jnp.zeros((1, cfg.low_dim_size))
    lang = jnp.zeros((1, 4, 16))
    variables = net.init(jax.random.key(0), vox, proprio, lang)
    out = net.apply(variables, vox, proprio, lang)
    assert len(out) == 5
    assert out[0].shape == (1, 10, 10, 10)
    assert out[3].shape == (1, 10, 10, 10, 8)   # voxel_feat
    assert out[4].shape == (1, 8)               # (V/patch)^3 = 2^3
