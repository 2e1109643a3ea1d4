"""MGNet: the cascade BRDF encoder/decoder family (NHWC flax modules).

Architecture parity with the reference ``encoder0``/``decoder0``
(/root/reference/models.py:87-203): a 6-conv stride-2 encoder
(3 or 17 -> 64 -> 128 -> 256 -> 256 -> 512 -> 1024, GroupNorm+ReLU,
replication pad on conv1 / zero pad after) and a U-Net style decoder with
bilinear x2 upsampling and skip concatenation, with per-task output heads:

  mode 0 (albedo): clamp(1.01 tanh, -1, 1)
  mode 1 (normal): clamp(1.01 tanh) then L2-normalize over channels
  mode 2 (rough):  clamp(1.01 tanh) then channel mean
  mode 3:          softmax over channels (kept for parity; unused by drivers)
  mode 4 (depth):  channel mean then clamp(1.01 tanh)

TPU-first deltas from the reference: NHWC layout, explicit functional
modules, and static-shape skip alignment (the reference's runtime
``F.interpolate``-to-match branches resolve at trace time here).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core.imageops import (
    replication_pad,
    resize_bilinear,
    upsample2x,
)

GN_EPS = 1e-5  # torch nn.GroupNorm default


class Encoder(nn.Module):
    """6-conv encoder returning all feature maps for U-Net skips.

    in_channels is 3 at cascade 0 and 17 at cascade >= 1
    (im3 + albedo3 + normal3 + rough1 + depth1 + diffuse3 + specular3).
    ``dtype`` is the compute dtype (bfloat16 for the MXU fast path;
    params stay float32).
    """

    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        assert x.shape[-1] == self.in_channels, (x.shape, self.in_channels)
        x = x.astype(self.dtype)

        def block(h, feats, groups, *, kernel, stride, pad_mode):
            if pad_mode == "edge":
                h = replication_pad(h, 1)
                padding = "VALID"
            else:
                padding = ((1, 1), (1, 1))
            h = nn.Conv(feats, (kernel, kernel), strides=stride,
                        padding=padding, dtype=self.dtype)(h)
            h = nn.GroupNorm(num_groups=groups, epsilon=GN_EPS,
                             dtype=self.dtype)(h)
            return nn.relu(h)

        x1 = block(x, 64, 4, kernel=4, stride=2, pad_mode="edge")
        x2 = block(x1, 128, 8, kernel=4, stride=2, pad_mode="zero")
        x3 = block(x2, 256, 16, kernel=4, stride=2, pad_mode="zero")
        x4 = block(x3, 256, 16, kernel=4, stride=2, pad_mode="zero")
        x5 = block(x4, 512, 32, kernel=4, stride=2, pad_mode="zero")
        x6 = block(x5, 1024, 64, kernel=3, stride=1, pad_mode="zero")
        return x1, x2, x3, x4, x5, x6


def _match_hw(x: jnp.ndarray, ref_hw) -> jnp.ndarray:
    if x.shape[1] != ref_hw[0] or x.shape[2] != ref_hw[1]:
        x = resize_bilinear(x, ref_hw)
    return x


def apply_head(x_orig: jnp.ndarray, mode: int) -> jnp.ndarray:
    """Per-task output transform on the final 3-channel conv output."""
    if mode == 0:
        return jnp.clip(1.01 * jnp.tanh(x_orig), -1.0, 1.0)
    if mode == 1:
        x = jnp.clip(1.01 * jnp.tanh(x_orig), -1.0, 1.0)
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        return x / jnp.clip(norm, 1e-6, None)
    if mode == 2:
        x = jnp.clip(1.01 * jnp.tanh(x_orig), -1.0, 1.0)
        return jnp.mean(x, axis=-1, keepdims=True)
    if mode == 3:
        return nn.softmax(x_orig, axis=-1)
    if mode == 4:
        x = jnp.mean(x_orig, axis=-1, keepdims=True)
        return jnp.clip(1.01 * jnp.tanh(x), -1.0, 1.0)
    raise ValueError(f"unknown decoder mode {mode}")


def _decoder_trunk(dtype, im_hw, feats) -> jnp.ndarray:
    """Shared U-Net trunk body (6 dblocks + final 3-ch conv, no head).

    Must be called from inside an ``@nn.compact`` ``__call__`` so the
    ``nn.Conv``/``nn.GroupNorm`` constructions register on the caller.
    Construction ORDER defines the param names (Conv_0..Conv_6,
    GroupNorm_0..GroupNorm_5) and is identical for every caller, so
    ``Decoder`` and ``DecoderTrunk`` share one param-tree layout.
    """
    x1, x2, x3, x4, x5, x6 = feats

    def dblock(h, feats_out, groups):
        h = nn.Conv(feats_out, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype)(h)
        h = nn.GroupNorm(num_groups=groups, epsilon=GN_EPS,
                         dtype=dtype)(h)
        return nn.relu(h)

    dx1 = dblock(x6, 512, 32)
    dx2 = dblock(upsample2x(jnp.concatenate([dx1, x5], -1)), 256, 16)
    dx2 = _match_hw(dx2, x4.shape[1:3])
    dx3 = dblock(upsample2x(jnp.concatenate([dx2, x4], -1)), 256, 16)
    dx3 = _match_hw(dx3, x3.shape[1:3])
    dx4 = dblock(upsample2x(jnp.concatenate([dx3, x3], -1)), 128, 8)
    dx4 = _match_hw(dx4, x2.shape[1:3])
    dx5 = dblock(upsample2x(jnp.concatenate([dx4, x2], -1)), 64, 4)
    dx5 = _match_hw(dx5, x1.shape[1:3])
    dx6 = dblock(upsample2x(jnp.concatenate([dx5, x1], -1)), 64, 4)
    dx6 = _match_hw(dx6, im_hw)

    return nn.Conv(3, (3, 3), padding="VALID", dtype=dtype)(
        replication_pad(dx6, 1)
    )


class Decoder(nn.Module):
    """U-Net decoder over the 6 encoder features; output head by ``mode``.

    The head math runs in float32 regardless of the compute dtype (the
    LSregress-coupled losses are sensitive to the normalize/clamp chain).
    """

    mode: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, im: jnp.ndarray, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        x_orig = _decoder_trunk(self.dtype, im.shape[1:3], feats)
        return apply_head(x_orig.astype(jnp.float32), self.mode)


class DecoderTrunk(nn.Module):
    """Head-less ``Decoder`` with the SAME param tree.

    Exists so the four per-task decoders (whose trunks are
    shape-identical — only the cheap elementwise heads differ) can run as
    ONE batched computation: stack the four param trees on a leading axis
    and ``jax.vmap`` this module.  The vmap batching rules turn the seven
    convs into grouped convs (feature_group_count=4), quartering the
    kernel count of the dominant cost in the BRDF train step (the four
    decoder stacks; see scripts/profile_steps.py)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, im_hw, feats) -> jnp.ndarray:
        return _decoder_trunk(self.dtype, im_hw, feats)
