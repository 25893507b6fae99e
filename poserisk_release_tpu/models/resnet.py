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
from jax import lax

BN_EPS = 1e-5


class StemConv(nn.Module):
    """The 7x7/stride-2 stem conv, with an optional space-to-depth layout.

    The parameter tree is IDENTICAL either way (the 7x7 HWIO kernel under
    <name>/kernel, converter-compatible with torchvision's conv1); `s2d`
    only changes how the SAME convolution is computed:

      * s2d=False: plain 7x7/s2/pad3 conv -- 3 input channels, which the
        MXU pads to its lane width, and a 49-tap spatial loop.
      * s2d=True: space-to-depth(2) first (224x224x3 -> 112x112x12), then
        a stride-1 4x4 conv whose kernel is an exact rearrangement of the
        7x7 weights (each tap (m, dr) reads full-res row 2m+dr-1; taps
        falling outside the 7x7 support are zero). 4x more input channels
        per MXU pass and 16 taps instead of 49 over a quarter the spatial
        positions -- the standard TPU ResNet stem transformation.

    Outputs are the same convolution evaluated in a different loop order:
    equal up to accumulation rounding (tests/test_spin.py pins the bound).
    """

    features: int = 64
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, cin, self.features))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        if not self.s2d:
            return lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)
        B, H, W, _ = x.shape
        y = x.reshape(B, H // 2, 2, W // 2, 2, cin)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * cin)
        # Embed the 7x7 kernel at offset (1, 1) of an 8x8 grid: half-res
        # tap (m, dr) covers full-res offset 2m+dr-4 in [-4, 3], and the
        # needed [-3, 3] support sits at grid rows 1..7 (row 0 is the
        # zero-weight -4 tap).
        k8 = jnp.zeros((8, 8, cin, self.features), kernel.dtype)
        k8 = k8.at[1:8, 1:8].set(kernel)
        k4 = k8.reshape(4, 2, 4, 2, cin, self.features)
        k4 = k4.transpose(0, 2, 1, 3, 4, 5)
        k4 = k4.reshape(4, 4, 4 * cin, self.features)
        return lax.conv_general_dilated(
            y, k4, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn)


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
    # Space-to-depth stem (StemConv.s2d): same weights, same outputs up to
    # accumulation rounding, better MXU mapping. Off by default; the TPU
    # fast path flips it per the measured in-situ A/B (docs/PERF.md).
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = StemConv(64, dtype=self.dtype, s2d=self.stem_s2d,
                     name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=BN_EPS, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1): implicit -inf padding.
        # Expressed as reduce_window padding (init is -inf), so no padded
        # copy of the 112x112x64 tensor is ever materialised.
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

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
