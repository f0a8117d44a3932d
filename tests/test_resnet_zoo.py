"""Representation-zoo de-aliasing tests: torchvision-layout ResNets with
golden weight-converter parity vs an independent torch forward, real
PointNet++ set abstraction, and distinct-features-per-name guarantees."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from real_robot_nerf_actor_tpu.models.pointnet2 import (
    PointNet2Encoder, ball_query, convert_torch_pointnet2_weights,
    farthest_point_sample)
from real_robot_nerf_actor_tpu.models.representations import (
    make_embedding, probe_out_dim)
from real_robot_nerf_actor_tpu.models.resnet import (
    RESNET18, RESNET50, TorchvisionResNet, convert_mocov2_weights,
    convert_torch_resnet_weights)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


# ---------------------------------------------------------------------------
# independent torch reference: a functional forward over a torchvision-layout
# state_dict (written from the torchvision paper spec, not imported)
# ---------------------------------------------------------------------------

def _t_bn(sd, pre, x):
    return F.batch_norm(x, sd[pre + ".running_mean"], sd[pre + ".running_var"],
                        sd[pre + ".weight"], sd[pre + ".bias"], False, 0, 1e-5)


def _t_basic(sd, pre, x, stride):
    r = x
    y = F.conv2d(x, sd[pre + ".conv1.weight"], stride=stride, padding=1)
    y = F.relu(_t_bn(sd, pre + ".bn1", y))
    y = F.conv2d(y, sd[pre + ".conv2.weight"], padding=1)
    y = _t_bn(sd, pre + ".bn2", y)
    if pre + ".downsample.0.weight" in sd:
        r = F.conv2d(x, sd[pre + ".downsample.0.weight"], stride=stride)
        r = _t_bn(sd, pre + ".downsample.1", r)
    return F.relu(y + r)


def _t_bottleneck(sd, pre, x, stride):
    r = x
    y = F.relu(_t_bn(sd, pre + ".bn1", F.conv2d(x, sd[pre + ".conv1.weight"])))
    y = F.conv2d(y, sd[pre + ".conv2.weight"], stride=stride, padding=1)
    y = F.relu(_t_bn(sd, pre + ".bn2", y))
    y = _t_bn(sd, pre + ".bn3", F.conv2d(y, sd[pre + ".conv3.weight"]))
    if pre + ".downsample.0.weight" in sd:
        r = F.conv2d(x, sd[pre + ".downsample.0.weight"], stride=stride)
        r = _t_bn(sd, pre + ".downsample.1", r)
    return F.relu(y + r)


def torch_resnet_forward(sd, x, spec):
    y = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    y = F.relu(_t_bn(sd, "bn1", y))
    y = F.max_pool2d(y, 3, 2, padding=1)
    blk = _t_bottleneck if spec.bottleneck else _t_basic
    for stage, n in enumerate(spec.stage_blocks):
        for i in range(n):
            stride = 2 if (stage > 0 and i == 0) else 1
            y = blk(sd, f"layer{stage + 1}.{i}", y, stride)
    return y.mean(dim=(2, 3))


def _random_state_dict(spec, rng):
    """Random torchvision-layout weights for the given spec."""
    sd = {}

    def add_conv(name, cin, cout, k):
        # he-ish scale keeps activations O(1) through 50 layers so the
        # fp32 comparison is meaningful
        s = (2.0 / (cin * k * k)) ** 0.5
        sd[name + ".weight"] = torch.as_tensor(
            rng.standard_normal((cout, cin, k, k)).astype(np.float32) * s)

    def add_bn(name, c):
        sd[name + ".weight"] = torch.as_tensor(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[name + ".bias"] = torch.as_tensor(
            rng.standard_normal(c).astype(np.float32) * 0.1)
        sd[name + ".running_mean"] = torch.as_tensor(
            rng.standard_normal(c).astype(np.float32) * 0.1)
        sd[name + ".running_var"] = torch.as_tensor(
            rng.uniform(0.5, 1.5, c).astype(np.float32))

    add_conv("conv1", 3, 64, 7)
    add_bn("bn1", 64)
    expansion = 4 if spec.bottleneck else 1
    cin = 64
    for stage, n in enumerate(spec.stage_blocks):
        feats = 64 * (2 ** stage)
        cout = feats * expansion
        for i in range(n):
            t = f"layer{stage + 1}.{i}"
            if spec.bottleneck:
                add_conv(t + ".conv1", cin, feats, 1)
                add_bn(t + ".bn1", feats)
                add_conv(t + ".conv2", feats, feats, 3)
                add_bn(t + ".bn2", feats)
                add_conv(t + ".conv3", feats, cout, 1)
                add_bn(t + ".bn3", cout)
            else:
                add_conv(t + ".conv1", cin, feats, 3)
                add_bn(t + ".bn1", feats)
                add_conv(t + ".conv2", feats, feats, 3)
                add_bn(t + ".bn2", feats)
            if i == 0 and (stage > 0 or cin != cout):
                add_conv(t + ".downsample.0", cin, cout, 1)
                add_bn(t + ".downsample.1", cout)
            cin = cout
    return sd


@pytest.mark.parametrize("spec", [RESNET18, RESNET50],
                         ids=["resnet18", "resnet50"])
def test_resnet_converter_matches_torch(spec):
    rng = np.random.default_rng(0)
    sd = _random_state_dict(spec, rng)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)

    want = torch_resnet_forward(sd, torch.as_tensor(x), spec).numpy()
    variables = convert_torch_resnet_weights(sd, spec)
    got = np.asarray(TorchvisionResNet(spec).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == (2, spec.out_dim)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_mocov2_converter_strips_prefixes():
    rng = np.random.default_rng(1)
    sd = _random_state_dict(RESNET18, rng)  # small arch for speed
    moco_sd = {"module.encoder_q." + k: v for k, v in sd.items()}
    moco_sd["module.encoder_q.fc.0.weight"] = torch.zeros(10, 512)
    moco_sd["module.encoder_k.conv1.weight"] = torch.zeros(64, 3, 7, 7)
    variables = convert_mocov2_weights(moco_sd, RESNET18)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    want = torch_resnet_forward(sd, torch.as_tensor(x), RESNET18).numpy()
    got = np.asarray(TorchvisionResNet(RESNET18).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# PointNet++
# ---------------------------------------------------------------------------

def test_farthest_point_sample_spreads():
    rng = np.random.default_rng(2)
    # two well-separated clusters: FPS must visit both early
    a = rng.normal(0, 0.05, (1, 50, 3))
    b = rng.normal(5, 0.05, (1, 50, 3))
    xyz = jnp.asarray(np.concatenate([a, b], 1).astype(np.float32))
    idx = np.asarray(farthest_point_sample(xyz, 4))[0]
    assert idx[0] == 0
    clusters = {int(i >= 50) for i in idx[:2]}
    assert clusters == {0, 1}
    assert len(set(idx.tolist())) == 4


def test_ball_query_matches_bruteforce():
    rng = np.random.default_rng(3)
    xyz = rng.uniform(0, 1, (1, 64, 3)).astype(np.float32)
    centers = xyz[:, :5]
    radius, k = 0.3, 8
    idx = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(centers),
                                radius, k))[0]
    d2 = ((centers[0][:, None] - xyz[0][None]) ** 2).sum(-1)
    for m in range(5):
        inside = np.where(d2[m] <= radius * radius)[0]
        want = inside[:k]
        got = idx[m]
        assert set(got.tolist()) <= set(inside.tolist())
        np.testing.assert_array_equal(got[:len(want)], want)
        if len(want) < k:   # misses padded with the first hit
            assert (got[len(want):] == want[0]).all()


def test_pointnet2_encoder_and_converter():
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.uniform(0, 1, (2, 600, 3)).astype(np.float32))
    enc = PointNet2Encoder()
    variables = enc.init(jax.random.key(0), pts)
    out = enc.apply(variables, pts)
    assert out.shape == (2, 1024)
    assert np.isfinite(np.asarray(out)).all()

    # converter: fabricate a reference-layout checkpoint, shapes must drop in
    sd = {}
    chans = {"sa1": ([3, 64, 64, 128]), "sa2": ([131, 128, 128, 256]),
             "sa3": ([259, 256, 512, 1024])}
    for sa, cs in chans.items():
        for j in range(3):
            sd[f"{sa}.mlp_convs.{j}.weight"] = torch.as_tensor(
                rng.standard_normal((cs[j + 1], cs[j], 1, 1)).astype(np.float32))
            sd[f"{sa}.mlp_convs.{j}.bias"] = torch.zeros(cs[j + 1])
            for suffix, val in (("weight", np.ones(cs[j + 1])),
                                ("bias", np.zeros(cs[j + 1])),
                                ("running_mean", np.zeros(cs[j + 1])),
                                ("running_var", np.ones(cs[j + 1]))):
                sd[f"{sa}.mlp_bns.{j}.{suffix}"] = torch.as_tensor(
                    val.astype(np.float32))
    converted = convert_torch_pointnet2_weights(sd)
    out2 = enc.apply(converted, pts)
    assert out2.shape == (2, 1024)


# ---------------------------------------------------------------------------
# zoo-wide guarantees
# ---------------------------------------------------------------------------

def test_zoo_names_give_distinct_features():
    """Same architecture, different registry names -> different features
    (the reference distinction is different pretrained checkpoints;
    un-pretrained, the name is folded into the init key)."""
    obs = np.random.default_rng(5).uniform(
        0, 1, (1, 32, 32, 3)).astype(np.float32)
    feats = {}
    for name in ("resnet50", "mocov2", "pri3d"):
        emb = make_embedding(name)
        v = emb.init(jax.random.key(0), obs)
        feats[name] = np.asarray(emb(v, obs))
    assert feats["resnet50"].shape == (1, 2048)
    assert np.abs(feats["resnet50"] - feats["mocov2"]).max() > 1e-4
    assert np.abs(feats["mocov2"] - feats["pri3d"]).max() > 1e-4


@pytest.mark.parametrize("name,dim", [
    ("resnet34", 512), ("imgnet", 2048), ("mvp", 768)])
def test_zoo_new_entries_probe(name, dim):
    obs = np.zeros((1, 32, 32, 3), np.float32)
    emb = make_embedding(name)
    assert probe_out_dim(emb, obs) == dim


def test_featurenerf_embedding_loads_trained_encoder():
    from real_robot_nerf_actor_tpu.models.encoder2d import SpatialEncoderConfig
    from real_robot_nerf_actor_tpu.models.pixelnerf import PixelNerfConfig
    from real_robot_nerf_actor_tpu.models.representations import (
        featurenerf_encoder_variables)
    from real_robot_nerf_actor_tpu.train.featurenerf import (
        FeatureNerfConfig, FeatureNerfTrainer)

    tiny_enc = SpatialEncoderConfig(stage_features=(4, 4, 8),
                                    blocks_per_stage=1)
    cfg = FeatureNerfConfig(model=PixelNerfConfig(
        d_embed=6, d_hidden=16, n_blocks=2, combine_layer=1,
        encoder=tiny_enc))
    tr = FeatureNerfTrainer(cfg)
    state = tr.init_state(jax.random.key(0), image_shape=(16, 16))

    emb = make_embedding("featurenerf", encoder_cfg=tiny_enc)
    variables = featurenerf_encoder_variables(state)
    obs = np.zeros((1, 16, 16, 3), np.float32)
    out = emb(variables, obs)
    assert out.shape == (1, 16)
