"""LightNet: spatially-varying lighting encoder/decoders (NHWC flax modules).

Architecture parity with the reference ``encoderLight``/``decoderLight``
(/root/reference/models.py:206-346): the encoder pre-processes an 11-channel
480x640 input (im3 + albedo3 + 0.5(normal+1)3 + 0.5(rough+1)1 + depth1) with
two stride-2 convs, optionally concatenates the previous cascade's SG
parameter tensor (sg_num*7 channels at 120x160), then runs 6 more convs to
1024 channels.  Three decoder instances emit the SG parameters on the
120x160 lighting grid:

  mode 0 (axis):   3*sg channels, unit-normalized per lobe -> [..., sg, 3]
  mode 1 (lambda): sg channels in [0, 1]
  mode 2 (weight): 3*sg channels in [0, 1] -> [..., sg, 3]

(The reference applies the final conv twice and discards the first result —
models.py:334-336; only the output semantics are kept here.)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core.imageops import (
    replication_pad,
    resize_bilinear,
    upsample2x,
)
from inverserenderingofindoorscene_tpu.models.mgnet import GN_EPS, _match_hw


class LightEncoder(nn.Module):
    sg_num: int = 12
    cascade_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, env_pre: Optional[jnp.ndarray] = None
    ) -> Sequence[jnp.ndarray]:
        x = x.astype(self.dtype)

        def block(h, feats, groups, *, kernel=4, stride=2, pad_mode="zero"):
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

        # preProcess: 11ch @ 480x640 -> 64ch @ 120x160
        h = block(x, 32, 2, pad_mode="edge")
        h = block(h, 64, 4, pad_mode="zero")

        if self.cascade_level > 0:
            assert env_pre is not None, "cascade>0 requires previous SG params"
            h = jnp.concatenate([h, env_pre.astype(self.dtype)], axis=-1)

        x1 = block(h, 128, 8, pad_mode="edge")
        x2 = block(x1, 256, 16)
        x3 = block(x2, 256, 16)
        x4 = block(x3, 512, 32)
        x5 = block(x4, 512, 32)
        x6 = block(x5, 1024, 64, kernel=3, stride=1)
        return x1, x2, x3, x4, x5, x6


class LightDecoder(nn.Module):
    """mode 0 = axis, 1 = lambda, 2 = weight; output on the env grid."""

    sg_num: int = 12
    mode: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], env_hw=(120, 160)) -> jnp.ndarray:
        x1, x2, x3, x4, x5, x6 = feats

        def dblock(h, feats_out, groups):
            h = nn.Conv(feats_out, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(h)
            h = nn.GroupNorm(num_groups=groups, epsilon=GN_EPS,
                             dtype=self.dtype)(h)
            return nn.relu(h)

        dx1 = dblock(x6, 512, 32)
        dx2 = dblock(upsample2x(jnp.concatenate([dx1, x5], -1)), 512, 32)
        dx2 = _match_hw(dx2, x4.shape[1:3])
        dx3 = dblock(upsample2x(jnp.concatenate([dx2, x4], -1)), 256, 16)
        dx3 = _match_hw(dx3, x3.shape[1:3])
        dx4 = dblock(upsample2x(jnp.concatenate([dx3, x3], -1)), 256, 16)
        dx4 = _match_hw(dx4, x2.shape[1:3])
        dx5 = dblock(upsample2x(jnp.concatenate([dx4, x2], -1)), 128, 8)
        dx5 = _match_hw(dx5, x1.shape[1:3])
        dx6 = dblock(upsample2x(jnp.concatenate([dx5, x1], -1)), 128, 8)
        dx6 = _match_hw(dx6, env_hw)

        out_ch = self.sg_num if self.mode == 1 else 3 * self.sg_num
        x_out = 1.01 * jnp.tanh(
            nn.Conv(out_ch, (3, 3), padding="VALID", dtype=self.dtype)(
                replication_pad(dx6, 1)
            ).astype(jnp.float32)
        )

        if self.mode in (1, 2):
            x_out = jnp.clip(0.5 * (x_out + 1.0), 0.0, 1.0)
            if self.mode == 2:
                b, h, w, _ = x_out.shape
                x_out = x_out.reshape(b, h, w, self.sg_num, 3)
        elif self.mode == 0:
            b, h, w, _ = x_out.shape
            x_out = x_out.reshape(b, h, w, self.sg_num, 3)
            norm = jnp.sqrt(jnp.sum(x_out * x_out, axis=-1, keepdims=True))
            x_out = x_out / jnp.clip(norm, 1e-6, None)
        return x_out
