"""Golden tests for the CLIP visual tower (ModifiedResNet RN50): converter
parity against an independent torch forward (including torch's own
multi_head_attention_forward for the attention pool, as the reference calls
it)."""
import numpy as np
import jax.numpy as jnp
import pytest

from real_robot_nerf_actor_tpu.models.clip_visual import (
    ClipVisualConfig, ClipVisualResNet, convert_clip_visual_weights)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

TINY = ClipVisualConfig(layers=(1, 1, 1, 1), width=16, output_dim=24,
                        heads=4, input_resolution=64)


def _t_bn(sd, pre, x):
    return F.batch_norm(x, sd[pre + ".running_mean"], sd[pre + ".running_var"],
                        sd[pre + ".weight"], sd[pre + ".bias"], False, 0, 1e-5)


def _t_bottleneck(sd, pre, x, stride):
    r = x
    y = F.relu(_t_bn(sd, pre + ".bn1", F.conv2d(x, sd[pre + ".conv1.weight"])))
    y = F.relu(_t_bn(sd, pre + ".bn2",
                     F.conv2d(y, sd[pre + ".conv2.weight"], padding=1)))
    if stride > 1:
        y = F.avg_pool2d(y, stride)
    y = _t_bn(sd, pre + ".bn3", F.conv2d(y, sd[pre + ".conv3.weight"]))
    if pre + ".downsample.0.weight" in sd:
        if stride > 1:
            r = F.avg_pool2d(r, stride)
        r = _t_bn(sd, pre + ".downsample.1",
                  F.conv2d(r, sd[pre + ".downsample.0.weight"]))
    return F.relu(y + r)


def torch_clip_visual(sd, x, cfg, pool=False):
    for i, stride in ((1, 2), (2, 1), (3, 1)):
        x = F.relu(_t_bn(sd, f"bn{i}",
                         F.conv2d(x, sd[f"conv{i}.weight"], stride=stride,
                                  padding=1)))
    x = F.avg_pool2d(x, 2)
    for stage, n in enumerate(cfg.layers):
        for i in range(n):
            stride = 2 if (stage > 0 and i == 0) else 1
            x = _t_bottleneck(sd, f"layer{stage + 1}.{i}", x, stride)
    if not pool:
        return x
    # reference AttentionPool2d (clip.py:91-127) via torch's own MHA
    b, c, h, w = x.shape
    t = x.reshape(b, c, h * w).permute(2, 0, 1)
    t = torch.cat([t.mean(dim=0, keepdim=True), t], dim=0)
    t = t + sd["attnpool.positional_embedding"][:, None, :]
    out, _ = F.multi_head_attention_forward(
        query=t, key=t, value=t, embed_dim_to_check=c,
        num_heads=cfg.heads,
        q_proj_weight=sd["attnpool.q_proj.weight"],
        k_proj_weight=sd["attnpool.k_proj.weight"],
        v_proj_weight=sd["attnpool.v_proj.weight"],
        in_proj_weight=None,
        in_proj_bias=torch.cat([sd["attnpool.q_proj.bias"],
                                sd["attnpool.k_proj.bias"],
                                sd["attnpool.v_proj.bias"]]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
        out_proj_weight=sd["attnpool.c_proj.weight"],
        out_proj_bias=sd["attnpool.c_proj.bias"],
        use_separate_proj_weight=True, training=False, need_weights=False)
    return out[0]


def _random_sd(cfg, rng):
    sd = {}

    def add_conv(name, cin, cout, k):
        s = (2.0 / (cin * k * k)) ** 0.5
        sd[name + ".weight"] = torch.as_tensor(
            rng.standard_normal((cout, cin, k, k)).astype(np.float32) * s)

    def add_bn(name, ch):
        sd[name + ".weight"] = torch.as_tensor(
            rng.uniform(0.5, 1.5, ch).astype(np.float32))
        sd[name + ".bias"] = torch.as_tensor(
            rng.standard_normal(ch).astype(np.float32) * 0.1)
        sd[name + ".running_mean"] = torch.as_tensor(
            rng.standard_normal(ch).astype(np.float32) * 0.1)
        sd[name + ".running_var"] = torch.as_tensor(
            rng.uniform(0.5, 1.5, ch).astype(np.float32))

    w = cfg.width
    add_conv("conv1", 3, w // 2, 3)
    add_bn("bn1", w // 2)
    add_conv("conv2", w // 2, w // 2, 3)
    add_bn("bn2", w // 2)
    add_conv("conv3", w // 2, w, 3)
    add_bn("bn3", w)
    cin = w
    for stage, n in enumerate(cfg.layers):
        planes = w * (2 ** stage)
        cout = planes * 4
        for i in range(n):
            t = f"layer{stage + 1}.{i}"
            add_conv(t + ".conv1", cin, planes, 1)
            add_bn(t + ".bn1", planes)
            add_conv(t + ".conv2", planes, planes, 3)
            add_bn(t + ".bn2", planes)
            add_conv(t + ".conv3", planes, cout, 1)
            add_bn(t + ".bn3", cout)
            stride = 2 if (stage > 0 and i == 0) else 1
            if stride > 1 or cin != cout:
                add_conv(t + ".downsample.0", cin, cout, 1)
                add_bn(t + ".downsample.1", cout)
            cin = cout
    c = cfg.feat_dim
    hw = (cfg.input_resolution // 32) ** 2
    sd["attnpool.positional_embedding"] = torch.as_tensor(
        rng.standard_normal((hw + 1, c)).astype(np.float32) * c ** -0.5)
    for name in ("q_proj", "k_proj", "v_proj"):
        sd[f"attnpool.{name}.weight"] = torch.as_tensor(
            rng.standard_normal((c, c)).astype(np.float32) * c ** -0.5)
        sd[f"attnpool.{name}.bias"] = torch.zeros(c)
    sd["attnpool.c_proj.weight"] = torch.as_tensor(
        rng.standard_normal((cfg.output_dim, c)).astype(np.float32) * c ** -0.5)
    sd["attnpool.c_proj.bias"] = torch.zeros(cfg.output_dim)
    return sd


def test_clip_visual_prepool_matches_torch():
    rng = np.random.default_rng(0)
    sd = _random_sd(TINY, rng)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    want = torch_clip_visual(sd, torch.as_tensor(x), TINY).numpy()
    variables = convert_clip_visual_weights(sd, TINY)
    got = np.asarray(ClipVisualResNet(TINY).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == (2, 2, 2, TINY.feat_dim)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-3, atol=2e-4)


def test_clip_visual_attnpool_matches_torch():
    rng = np.random.default_rng(1)
    sd = _random_sd(TINY, rng)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    want = torch_clip_visual(sd, torch.as_tensor(x), TINY, pool=True).numpy()
    variables = convert_clip_visual_weights(sd, TINY)
    got = np.asarray(ClipVisualResNet(TINY).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), pool=True))
    assert got.shape == (2, TINY.output_dim)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_clip_visual_prefix_stripping():
    rng = np.random.default_rng(2)
    sd = _random_sd(TINY, rng)
    full = {"visual." + k: v for k, v in sd.items()}
    full["text_projection"] = torch.zeros(4, 4)  # non-visual entries ignored
    v1 = convert_clip_visual_weights(full, TINY)
    v2 = convert_clip_visual_weights(sd, TINY)
    a = jnp.asarray(np.zeros((1, 64, 64, 3), np.float32))
    o1 = ClipVisualResNet(TINY).apply(v1, a, pool=True)
    o2 = ClipVisualResNet(TINY).apply(v2, a, pool=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
