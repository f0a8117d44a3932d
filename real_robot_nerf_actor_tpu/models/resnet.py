"""Torchvision-compatible ResNet family (flax, NHWC) + weight converters.

Reference behavior: /root/reference/featurenerf_robo/src/representations/resnet.py
(ResNet18/34/50Encoder: ImageNet-pretrained torchvision backbone with
``fc = Identity`` -> global pooled feature) and mocov2.py (MoCo v2
checkpoint's ResNet-50 ``encoder_q``); pri3d.py uses the same ResNet-50
layout. The pretrained checkpoints are *data*: converters below map any
torch ResNet ``state_dict`` of this layout to flax params + batch stats
(zero egress — weights are supplied by the caller, not downloaded).

Architecture matches torchvision exactly so converted checkpoints reproduce
reference features: 7x7/s2 stem, 3x3/s2 max pool, 4 stages of basic (18/34)
or bottleneck (50) blocks with 1x1-conv downsample shortcuts, global
average pool. Inference runs with frozen batch-norm statistics (the zoo
encoders are feature extractors).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    bottleneck: bool
    stage_blocks: Tuple[int, int, int, int]

    @property
    def out_dim(self) -> int:
        return 512 * (4 if self.bottleneck else 1)


RESNET18 = ResNetSpec(False, (2, 2, 2, 2))
RESNET34 = ResNetSpec(False, (3, 4, 6, 3))
RESNET50 = ResNetSpec(True, (3, 4, 6, 3))


def _bn(name: str, train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1", train)(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = _bn("bn2", train)(y)
        if r.shape[-1] != self.features or self.stride != 1:
            r = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        use_bias=False, name="down_conv")(r)
            r = _bn("down_bn", train)(r)
        return nn.relu(y + r)


class _Bottleneck(nn.Module):
    features: int          # bottleneck width; output is 4x this
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        r = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1", train)(y))
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, name="conv2")(y)
        y = nn.relu(_bn("bn2", train)(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = _bn("bn3", train)(y)
        if r.shape[-1] != out_ch or self.stride != 1:
            r = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                        use_bias=False, name="down_conv")(r)
            r = _bn("down_bn", train)(r)
        return nn.relu(y + r)


class TorchvisionResNet(nn.Module):
    """NHWC ResNet; ``__call__`` returns the (B, out_dim) pooled feature."""

    spec: ResNetSpec = RESNET18

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 spatial: bool = False):
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        y = nn.relu(_bn("bn1", train)(y))
        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        block = _Bottleneck if self.spec.bottleneck else _BasicBlock
        for stage, n_blocks in enumerate(self.spec.stage_blocks):
            feats = 64 * (2 ** stage)
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                y = block(feats, stride,
                          name=f"layer{stage + 1}_{i}")(y, train=train)
        if spatial:
            return y
        return jnp.mean(y, axis=(1, 2))


# --------------------------------------------------------------- converters
def convert_torch_resnet_weights(state_dict: Dict, spec: ResNetSpec) -> dict:
    """Map a torchvision-layout ResNet ``state_dict`` (NCHW convs, running
    BN stats; ``fc.*`` ignored) to this module's variables."""
    params: Dict = {}
    stats: Dict = {}

    def conv(dst, src):
        w = np.asarray(state_dict[src + ".weight"])
        _put(params, dst + ["kernel"], w.transpose(2, 3, 1, 0))

    def bn(dst, src):
        _put(params, dst + ["scale"], np.asarray(state_dict[src + ".weight"]))
        _put(params, dst + ["bias"], np.asarray(state_dict[src + ".bias"]))
        _put(stats, dst + ["mean"],
             np.asarray(state_dict[src + ".running_mean"]))
        _put(stats, dst + ["var"], np.asarray(state_dict[src + ".running_var"]))

    conv(["conv1"], "conv1")
    bn(["bn1"], "bn1")
    n_convs = 3 if spec.bottleneck else 2
    for stage, n_blocks in enumerate(spec.stage_blocks):
        for i in range(n_blocks):
            t = f"layer{stage + 1}.{i}"
            d = f"layer{stage + 1}_{i}"
            for c in range(1, n_convs + 1):
                conv([d, f"conv{c}"], f"{t}.conv{c}")
                bn([d, f"bn{c}"], f"{t}.bn{c}")
            if f"{t}.downsample.0.weight" in state_dict:
                conv([d, "down_conv"], f"{t}.downsample.0")
                bn([d, "down_bn"], f"{t}.downsample.1")
    return {"params": params,
            "batch_stats": stats}


def convert_mocov2_weights(state_dict: Dict, spec: ResNetSpec = RESNET50
                           ) -> dict:
    """MoCo v2 checkpoint (``state_dict`` with ``module.encoder_q.``
    prefixes; MLP head dropped) -> flax variables
    (reference mocov2.py: encoder_q with ``fc = Identity``)."""
    stripped = {}
    for k, v in state_dict.items():
        for pre in ("module.encoder_q.", "encoder_q."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        else:
            continue
        if not k.startswith("fc."):
            stripped[k] = v
    return convert_torch_resnet_weights(stripped, spec)


def _put(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = jnp.asarray(value)
