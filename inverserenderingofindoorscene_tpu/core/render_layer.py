"""The full differentiable rendering layer (pool -> shade).

Composes adaptive average pooling of the BRDF maps down to the lighting
grid resolution with the hemisphere shading integral, mirroring the
reference ``renderingLayer.forwardEnv`` (/root/reference/models.py:461-522)
end to end.  The fast path swaps ``core.brdf.render_envmap`` for the fused
Pallas kernel (ops/sg_render.py) when running on TPU.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core import brdf, imageops


@dataclasses.dataclass(frozen=True)
class RenderLayer:
    """Differentiable shading of albedo/normal/rough against per-pixel envmaps.

    Attributes mirror the reference constructor: lighting grid is
    env_rows x env_cols (120x160), per-pixel envmap env_height x env_width
    (8x16), fov in degrees, Fresnel F0.
    """

    env_rows: int = 120
    env_cols: int = 160
    env_height: int = 8
    env_width: int = 16
    fov_deg: float = 57.0
    f0: float = 0.05

    def forward_env(
        self,
        albedo: jnp.ndarray,
        normal: jnp.ndarray,
        rough: jnp.ndarray,
        envmap: jnp.ndarray,
    ):
        """Args are NHWC: albedo [B,h,w,3], normal [B,h,w,3], rough [B,h,w,1],
        envmap [B,R,C,D,3] with D = env_height*env_width. The BRDF maps are
        adaptively average-pooled to (R, C) before shading (normal is
        re-normalized after pooling inside render_envmap).

        Returns (diffuse, specular), each [B,R,C,3].
        """
        r, c = envmap.shape[1], envmap.shape[2]
        albedo = imageops.adaptive_avg_pool(albedo, (r, c))
        normal = imageops.adaptive_avg_pool(normal, (r, c))
        rough = imageops.adaptive_avg_pool(rough, (r, c))
        return brdf.render_envmap(
            albedo,
            normal,
            rough,
            envmap,
            fov_deg=self.fov_deg,
            f0=self.f0,
            env_height=self.env_height,
            env_width=self.env_width,
        )
