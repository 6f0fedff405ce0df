"""DenseNet-121 feature trunk in Flax (NHWC, bf16-friendly).

The reference's affordance networks are built on three torchvision
DenseNet-121 trunks per model (reference code/models.py:22-24,308-310,
`trunk.features(x)` -> 1024-channel stride-32 features). This is the same
architecture laid out for the MXU: NHWC layout, channel counts that tile
onto 128-lane registers, bfloat16 compute with float32 BatchNorm statistics.

Divergence note: the reference initializes from ImageNet-pretrained weights
(models.py:22, pretrained=True). This sandbox has no network egress, so
trunks initialize with He-normal weights; the trainer learns from scratch
(the multistage scheme's labels come from simulation rollouts either way).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# DenseNet-121 configuration (torchvision parity).
# BatchNorm running averages: torch updates ra = (1 - m_t) * ra + m_t *
# batch with m_t = 0.1 (torchvision default); the flax momentum is the
# retention factor, so 0.9 here == the reference's update speed (the
# flax default 0.99 adapted 10x slower — PARITY.md).
BN_MOMENTUM = 0.9
GROWTH_RATE = 32
BLOCK_CONFIG = (6, 12, 24, 16)
NUM_INIT_FEATURES = 64
BN_SIZE = 4  # bottleneck width multiplier


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.BatchNorm(
            momentum=BN_MOMENTUM, use_running_average=not train, dtype=self.dtype, name="norm1"
        )(x)
        h = nn.relu(h)
        h = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(h)
        h = nn.BatchNorm(
            momentum=BN_MOMENTUM, use_running_average=not train, dtype=self.dtype, name="norm2"
        )(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.growth_rate, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(h)
        return jnp.concatenate([x, h.astype(x.dtype)], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    bn_size: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        for i in range(self.num_layers):
            x = DenseLayer(
                self.growth_rate, self.bn_size, self.dtype,
                name=f"denselayer{i + 1}",
            )(x, train)
        return x


class Transition(nn.Module):
    out_features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(
            momentum=BN_MOMENTUM, use_running_average=not train, dtype=self.dtype, name="norm"
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_features, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class DenseNetTrunk(nn.Module):
    """`densenet121().features` equivalent: image -> (H/32, W/32, 1024)."""

    growth_rate: int = GROWTH_RATE
    block_config: Sequence[int] = BLOCK_CONFIG
    num_init_features: int = NUM_INIT_FEATURES
    bn_size: int = BN_SIZE
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.num_init_features, (7, 7), strides=(2, 2), padding=3,
            use_bias=False, dtype=self.dtype, name="conv0",
        )(x)
        x = nn.BatchNorm(
            momentum=BN_MOMENTUM, use_running_average=not train, dtype=self.dtype, name="norm0"
        )(x)
        x = nn.relu(x).astype(self.dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            x = DenseBlock(
                num_layers, self.growth_rate, self.bn_size, self.dtype,
                name=f"denseblock{i + 1}",
            )(x, train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                num_features //= 2
                x = Transition(
                    num_features, self.dtype, name=f"transition{i + 1}"
                )(x, train)
        x = nn.BatchNorm(
            momentum=BN_MOMENTUM, use_running_average=not train, dtype=self.dtype, name="norm5"
        )(x)
        return x


class TinyTrunk(nn.Module):
    """A small stride-32 convnet with the same output contract (1024 ch).

    For fast experimentation / CI and throughput-oriented deployments;
    selected via ModelConfig.trunk = 'tiny'.
    """

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        widths = (32, 64, 128, 256, 512)
        for i, w in enumerate(widths):
            x = nn.Conv(
                w, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                momentum=BN_MOMENTUM, use_running_average=not train, dtype=self.dtype,
                name=f"norm{i}",
            )(x)
            x = nn.relu(x).astype(self.dtype)
        x = nn.Conv(
            1024, (1, 1), use_bias=False, dtype=self.dtype, name="proj"
        )(x)
        return x


def make_trunk(kind: str, dtype=jnp.bfloat16, name: str | None = None
               ) -> nn.Module:
    if kind == "densenet121":
        return DenseNetTrunk(dtype=dtype, name=name)
    if kind == "tiny":
        return TinyTrunk(dtype=dtype, name=name)
    raise ValueError(f"unknown trunk '{kind}'")
