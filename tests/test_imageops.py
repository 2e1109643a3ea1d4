"""Unit tests for the imageops fast paths.

The dwconv 2x-upsample and the hand-written replication-pad VJP are
size-gated or only differ from the naive lowering in the BACKWARD pass,
so the model-level tests never pin them down directly; these do.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.core.imageops import (
    _replication_pad1,
    _upsample2x_dwconv,
    replication_pad,
    resize_bilinear,
    upsample2x,
)


def test_dwconv_upsample_matches_resize_small():
    """The dilated-depthwise-conv formulation (incl. the 4/3 border
    correction) is exact 2x bilinear with half-pixel centers."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 20, 8), jnp.float32)
    ref = jax.image.resize(x, (2, 32, 40, 8), method="linear")
    got = _upsample2x_dwconv(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_dwconv_upsample_gate_routing():
    """The routing predicate of resize_bilinear: dwconv only on exact-2x
    large wide tensors (numeric equality of the fast path is pinned by
    test_dwconv_upsample_matches_resize_small — same code path, the gate
    only selects it, so no 32 MB tensors needed here)."""
    from inverserenderingofindoorscene_tpu.core.imageops import (
        _use_dwconv_upsample,
    )

    # the BRDF decoder tail shape the gate was measured on
    assert _use_dwconv_upsample(4, 120, 160, 128, 240, 320)
    # light decoders' small B5 tensors stay on the matmul path
    assert not _use_dwconv_upsample(5, 60, 80, 128, 120, 160)
    # narrow channels / non-2x / non-integer factors stay off too
    assert not _use_dwconv_upsample(4, 120, 160, 16, 240, 320)
    assert not _use_dwconv_upsample(4, 120, 160, 128, 241, 320)
    assert not _use_dwconv_upsample(4, 120, 160, 128, 120, 160)


def test_dwconv_upsample_gradients_match_resize():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 12, 10, 4), jnp.float32)
    w = jnp.asarray(rng.randn(1, 24, 20, 4), jnp.float32)

    def loss(up):
        return lambda t: jnp.sum(up(t) * w)

    g_ref = jax.grad(
        loss(lambda t: jax.image.resize(t, (1, 24, 20, 4), method="linear"))
    )(x)
    g_dw = jax.grad(loss(_upsample2x_dwconv))(x)
    np.testing.assert_allclose(np.asarray(g_dw), np.asarray(g_ref), atol=2e-6)


@pytest.mark.parametrize("shape", [(2, 6, 7, 3), (1, 2, 2, 1), (1, 3, 2, 5)])
def test_replication_pad_custom_vjp_matches_xla(shape):
    """The hand-written edge-fold backward equals XLA's AD of jnp.pad."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    w = jnp.asarray(rng.randn(shape[0], shape[1] + 2, shape[2] + 2, shape[3]),
                    jnp.float32)

    def ref_pad(t):
        return jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    np.testing.assert_array_equal(
        np.asarray(_replication_pad1(x)), np.asarray(ref_pad(x))
    )
    g_ref = jax.grad(lambda t: jnp.sum(ref_pad(t) * w))(x)
    g_got = jax.grad(lambda t: jnp.sum(replication_pad(t, 1) * w))(x)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_ref), atol=1e-6
    )


def test_upsample2x_small_keeps_matmul_path_semantics():
    """Below the gate upsample2x is plain jax.image.resize."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 9, 4), jnp.float32)
    ref = jax.image.resize(x, (2, 16, 18, 4), method="linear")
    np.testing.assert_array_equal(np.asarray(upsample2x(x)), np.asarray(ref))
