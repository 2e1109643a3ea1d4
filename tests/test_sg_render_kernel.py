"""Fused Pallas SG-shading kernel vs the jnp reference path (interpret mode).

On CPU the kernel runs in the Pallas interpreter; the same code compiles
with Mosaic on TPU (exercised by bench.py / the driver's compile check).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core import brdf, sg
from inverserenderingofindoorscene_tpu.ops.sg_render import render_sg


def make_inputs(b=1, h=16, w=24, k=12, seed=0, normal_scale=0.97):
    """normal_scale < 1 keeps |n|^2 off the clip(.,1e-6,1.0) upper bound,
    where the clamp-tie gradient is ill-defined in both impls."""
    rng = np.random.RandomState(seed)
    albedo = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    normal = rng.uniform(-1, 1, (b, h, w, 3))
    normal[..., 2] = np.abs(normal[..., 2]) + 0.3
    normal = jnp.asarray(
        normal_scale * normal / np.linalg.norm(normal, axis=-1, keepdims=True),
        jnp.float32,
    )
    rough = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)), jnp.float32)
    ax = rng.uniform(-1, 1, (b, h, w, k, 3))
    ax = jnp.asarray(ax / np.linalg.norm(ax, axis=-1, keepdims=True), jnp.float32)
    lamb = jnp.asarray(rng.uniform(0, 20, (b, h, w, k)), jnp.float32)
    wgt = jnp.asarray(rng.uniform(0, 2, (b, h, w, k, 3)), jnp.float32)
    return albedo, normal, rough, ax, lamb, wgt


def jnp_ref(albedo, normal, rough, ax, lamb, wgt):
    env = sg.sg_to_envmap(ax, lamb, wgt)
    return brdf.render_envmap(albedo, normal, rough, env)


def test_forward_allclose():
    args = make_inputs()
    d0, s0 = jnp_ref(*args)
    d1, s1 = render_sg(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=5e-4)


def test_forward_nonaligned_pixel_count():
    # 10*13 = 130 pixels: not a multiple of TILE_P, exercises padding.
    args = make_inputs(b=1, h=10, w=13)
    d0, s0 = jnp_ref(*args)
    d1, s1 = render_sg(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=5e-4)


def test_gradients_allclose():
    args = make_inputs()

    def loss(f):
        def g(*a):
            d, s = f(*a)
            return jnp.sum(d * 1.3 + s * 0.7)

        return g

    g_ref = jax.grad(loss(jnp_ref), argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_pal = jax.grad(
        loss(lambda *a: render_sg(*a, interpret=True)), argnums=(0, 1, 2, 3, 4, 5)
    )(*args)
    names = ["albedo", "normal", "rough", "axis", "lamb", "weight"]
    for nm, a, b in zip(names, g_ref, g_pal):
        scale = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-3, err_msg=nm
        )


def test_zero_weight_gives_zero_output():
    albedo, normal, rough, ax, lamb, wgt = make_inputs()
    d, s = render_sg(albedo, normal, rough, ax, lamb, jnp.zeros_like(wgt),
                     interpret=True)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-7)


@pytest.mark.parametrize("k", [1, 4, 24])
def test_forward_other_lobe_counts(k):
    """The kernel unrolls over sg_num generically — not just SG12."""
    args = make_inputs(k=k)
    d0, s0 = jnp_ref(*args)
    d1, s1 = render_sg(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=5e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-3)


def test_envmap_kernel_matches_jnp():
    from inverserenderingofindoorscene_tpu.ops.sg_render import sg_envmap

    albedo, normal, rough, ax, lamb, wgt = make_inputs(h=10, w=13)
    e0 = sg.sg_to_envmap(ax, lamb, wgt)
    e1 = sg_envmap(ax, lamb, wgt, interpret=True)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0), atol=2e-5)

    def loss(f):
        def g(a, l, w):
            return jnp.sum(f(a, l, w) ** 2)

        return g

    g0 = jax.grad(loss(sg.sg_to_envmap), argnums=(0, 1, 2))(ax, lamb, wgt)
    g1 = jax.grad(
        loss(lambda a, l, w: sg_envmap(a, l, w, interpret=True)),
        argnums=(0, 1, 2),
    )(ax, lamb, wgt)
    for nm, a, b in zip(["axis", "lamb", "weight"], g0, g1):
        scale = max(float(jnp.abs(a).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-3,
            err_msg=nm,
        )


def test_fused_serving_kernel_matches_pair():
    """render_sg_env (one serving kernel) == render_sg + sg_envmap
    exactly: same tile math, the env planes are just written out."""
    from inverserenderingofindoorscene_tpu.ops.sg_render import (
        render_sg_env,
        sg_envmap,
    )

    args = make_inputs(b=1, h=10, w=13)  # non-aligned: padding exercised
    d0, s0 = render_sg(*args, interpret=True)
    e0 = sg_envmap(*args[3:], interpret=True)
    d1, s1, e1 = render_sg_env(*args, interpret=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e0))
    # and against the pure-jnp oracle route
    d2, s2 = jnp_ref(*args)
    e2 = sg.sg_to_envmap(*args[3:])
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=5e-4)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=2e-5,
                               atol=1e-5)
