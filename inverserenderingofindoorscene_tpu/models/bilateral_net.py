"""Confidence CNN for the bilateral solver (NHWC flax module).

Architecture parity with the reference ``BilateralLayer`` CNN
(/root/reference/BilateralLayer.py:211-232, 258-270): a 2-down/2-up net
(k4s2 conv x2 -> k3 conv -> upsample+skip -> k3 conv -> upsample -> k3
head) predicting a per-pixel confidence in [0, 1], normalized by the
global max over the batch tensor (BilateralLayer.py:268-269).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core.imageops import (
    replication_pad,
    resize_bilinear,
)

GN_EPS = 1e-5


class ConfidenceNet(nn.Module):
    """in_channels = 6 for albedo (image3+pred3), 4 for rough/depth."""

    in_channels: int = 6

    @nn.compact
    def __call__(self, image: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        """image [B,H,W,3], pred [B,H,W,C]. Returns conf [B,H,W,1].

        Image is max-normalized per image (clamp 1e-5..1,
        BilateralLayer.py:246-250); input concat is stop-gradiented like
        the reference ``.detach()`` (252).
        """
        b = image.shape[0]
        scale = jnp.clip(
            jnp.max(image.reshape(b, -1), axis=1), 1e-5, 1.0
        ).reshape(b, 1, 1, 1)
        image = image / scale

        x = jax.lax.stop_gradient(jnp.concatenate([image, pred], axis=-1))
        assert x.shape[-1] == self.in_channels, (x.shape, self.in_channels)

        def down(h, feats):
            h = replication_pad(h, 1)
            h = nn.Conv(feats, (4, 4), strides=2, padding="VALID")(h)
            h = nn.GroupNorm(num_groups=2, epsilon=GN_EPS)(h)
            return nn.relu(h)

        x1 = down(x, 16)
        x2 = down(x1, 16)

        dx1 = nn.relu(
            nn.GroupNorm(num_groups=2, epsilon=GN_EPS)(
                nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)))(x2)
            )
        )
        dx1 = resize_bilinear(dx1, x1.shape[1:3])
        dx2 = nn.relu(
            nn.GroupNorm(num_groups=2, epsilon=GN_EPS)(
                nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)))(
                    jnp.concatenate([dx1, x1], axis=-1)
                )
            )
        )
        dx2 = resize_bilinear(dx2, x.shape[1:3])
        out = nn.Conv(1, (3, 3), padding="VALID")(replication_pad(dx2, 1))
        conf = 0.5 * (jnp.tanh(out) + 1.0)
        # global max over the whole batch tensor (BilateralLayer.py:269)
        return conf / jnp.clip(jnp.max(conf), 1e-5, None)
