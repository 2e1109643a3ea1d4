"""Network architecture parity: shapes + parameter counts vs the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inverserenderingofindoorscene_tpu.models import (
    Decoder,
    Encoder,
    LightDecoder,
    LightEncoder,
)


def n_params(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


class TestMGNet:
    def test_encoder_shapes_240x320(self):
        enc = Encoder(in_channels=3)
        x = jnp.zeros((1, 240, 320, 3), jnp.float32)
        params = enc.init(jax.random.key(0), x)
        feats = enc.apply(params, x)
        shapes = [f.shape for f in feats]
        # reference trace at 240x320 (models.py:121-127)
        assert shapes == [
            (1, 120, 160, 64),
            (1, 60, 80, 128),
            (1, 30, 40, 256),
            (1, 15, 20, 256),
            (1, 7, 10, 512),
            (1, 7, 10, 1024),
        ]

    @pytest.mark.parametrize("mode,out_ch", [(0, 3), (1, 3), (2, 1), (4, 1)])
    def test_decoder_shapes_and_ranges(self, mode, out_ch):
        enc = Encoder(in_channels=3)
        x = jnp.zeros((1, 240, 320, 3), jnp.float32)
        ep = enc.init(jax.random.key(0), x)
        feats = enc.apply(ep, x)
        dec = Decoder(mode=mode)
        dp = dec.init(jax.random.key(1), x, feats)
        out = dec.apply(dp, x, feats)
        assert out.shape == (1, 240, 320, out_ch)
        out = np.asarray(out)
        assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
        if mode == 1:
            norms = np.linalg.norm(out, axis=-1)
            # zero-init conv output -> tanh(0)=0 -> normalize clamps; just shape
            assert norms.shape == (1, 240, 320)

    def test_param_count_matches_torch(self):
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "/root/reference")
        import models as ref_models

        for casc, in_ch in [(0, 3), (1, 17)]:
            ref = ref_models.encoder0(cascadeLevel=casc)
            ref_n = sum(p.numel() for p in ref.parameters())
            enc = Encoder(in_channels=in_ch)
            p = enc.init(
                jax.random.key(0), jnp.zeros((1, 64, 64, in_ch), jnp.float32)
            )
            assert n_params(p) == ref_n, f"encoder cascade {casc}"

        ref = ref_models.decoder0(mode=0)
        ref_n = sum(p.numel() for p in ref.parameters())
        enc = Encoder(in_channels=3)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        feats = enc.apply(enc.init(jax.random.key(0), x), x)
        dec = Decoder(mode=0)
        dp = dec.init(jax.random.key(1), x, feats)
        assert n_params(dp) == ref_n


class TestLightNet:
    def test_encoder_shapes_480x640(self):
        enc = LightEncoder(sg_num=12, cascade_level=0)
        x = jnp.zeros((1, 480, 640, 11), jnp.float32)
        p = enc.init(jax.random.key(0), x)
        feats = enc.apply(p, x)
        shapes = [f.shape for f in feats]
        assert shapes == [
            (1, 60, 80, 128),
            (1, 30, 40, 256),
            (1, 15, 20, 256),
            (1, 7, 10, 512),
            (1, 3, 5, 512),
            (1, 3, 5, 1024),
        ]

    @pytest.mark.parametrize("mode", [0, 1, 2])
    def test_decoder_shapes(self, mode):
        enc = LightEncoder(sg_num=12, cascade_level=0)
        x = jax.random.uniform(jax.random.key(7), (1, 480, 640, 11), jnp.float32)
        feats = enc.apply(enc.init(jax.random.key(0), x), x)
        dec = LightDecoder(sg_num=12, mode=mode)
        p = dec.init(jax.random.key(1), feats, (120, 160))
        out = dec.apply(p, feats, (120, 160))
        if mode == 1:
            assert out.shape == (1, 120, 160, 12)
        else:
            assert out.shape == (1, 120, 160, 12, 3)
        if mode == 0:
            norms = np.linalg.norm(np.asarray(out), axis=-1)
            np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_cascade1_concat(self):
        enc = LightEncoder(sg_num=12, cascade_level=1)
        x = jnp.zeros((1, 480, 640, 11), jnp.float32)
        env_pre = jnp.zeros((1, 120, 160, 84), jnp.float32)
        p = enc.init(jax.random.key(0), x, env_pre)
        feats = enc.apply(p, x, env_pre)
        assert feats[-1].shape == (1, 3, 5, 1024)

    def test_param_count_matches_torch(self):
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "/root/reference")
        import models as ref_models

        ref = ref_models.encoderLight(SGNum=12, cascadeLevel=0)
        ref_n = sum(p.numel() for p in ref.parameters())
        enc = LightEncoder(sg_num=12, cascade_level=0)
        p = enc.init(jax.random.key(0), jnp.zeros((1, 128, 128, 11), jnp.float32))
        assert n_params(p) == ref_n

        for mode in (0, 1, 2):
            ref = ref_models.decoderLight(SGNum=12, mode=mode)
            ref_n = sum(p.numel() for p in ref.parameters())
            x = jnp.zeros((1, 128, 128, 11), jnp.float32)
            feats = enc.apply(p, x)
            dec = LightDecoder(sg_num=12, mode=mode)
            dp = dec.init(jax.random.key(1), feats, (32, 32))
            assert n_params(dp) == ref_n, f"light decoder mode {mode}"
