"""ResNet-50 backbone (Flax linen), numerics-compatible with SPIN's torch copy.

SPIN's hmr model embeds torchvision's ResNet-50 (v1.5: stride on the 3x3
bottleneck conv) -- behavioural contract at /root/reference/lib/core/base.py:
81-84, 220 and SURVEY.md section 2.10. This is the TPU-native rebuild: NHWC
layout, inference-mode BatchNorm (running statistics), params convertible
1:1 from a torch state_dict (models/convert.py).

Naming: submodule attribute names mirror the torch module paths
(conv1/bn1/layer{1..4}_{i}/...) so the weight converter is a pure rename.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

BN_EPS = 1e-5


class Bottleneck(nn.Module):
    """torchvision-style bottleneck: 1x1 -> 3x3(stride) -> 1x1, expansion 4."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    # Computation dtype: bfloat16 halves HBM traffic and doubles MXU rate on
    # TPU. NOTE: flax BatchNorm normalises in this dtype too, and the fast
    # path additionally casts the stored running stats to bf16
    # (spin.cast_backbone_params) -- the f32-parity guarantee is the
    # measured zero score drift documented there, not any f32 island here.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=True, epsilon=BN_EPS, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = nn.BatchNorm(use_running_average=True, epsilon=BN_EPS, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = nn.BatchNorm(use_running_average=True, epsilon=BN_EPS, dtype=self.dtype, name="bn3")(out)
        if self.has_downsample:
            identity = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=True, epsilon=BN_EPS, dtype=self.dtype, name="downsample_bn"
            )(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """Feature extractor: NHWC (B, 224, 224, 3) -> (B, 2048) pooled features."""

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=BN_EPS, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1) pads with -inf-equivalent
        # (implicit minimum); replicate with explicit -inf padding.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=jnp.finfo(self.dtype).min)
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding="VALID")

        planes = (64, 128, 256, 512)
        for stage, (n_blocks, p) in enumerate(zip(self.layers, planes), start=1):
            for block in range(n_blocks):
                stride = 2 if (stage > 1 and block == 0) else 1
                x = Bottleneck(
                    planes=p,
                    stride=stride,
                    has_downsample=(block == 0),
                    dtype=self.dtype,
                    name=f"layer{stage}_{block}",
                )(x)

        # Global average pool over the final 7x7 map (torch AvgPool2d(7)).
        # Pooled features return to f32 so the IEF head runs full precision.
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))
