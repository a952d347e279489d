"""HuBERT Flax port parity vs HuggingFace torch (tiny config).

Instantiates a randomly-initialised HF HubertModel in the -large layout
(do_stable_layer_norm=True, feat_extract_norm='layer') at toy size, converts
its state_dict with compat.hubert_ckpt, and checks the Flax port reproduces
the torch forward to float32 tolerance.  This validates the whole mapping:
conv stack, feature projection, weight-normed positional conv, pre-LN
attention layers, final LN.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from diffsheg_tpu.compat.hubert_ckpt import convert_hubert_state_dict
from diffsheg_tpu.models.hubert import HubertConfig, HubertModel


def _tiny_pair(seed=0):
    hf_cfg = transformers.HubertConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_kernel=(4, 3),
        conv_stride=(2, 2),
        num_conv_pos_embeddings=8,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        feat_proj_dropout=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        layerdrop=0.0,
        conv_bias=True,
    )
    torch.manual_seed(seed)
    hf = transformers.HubertModel(hf_cfg).eval()
    ours_cfg = HubertConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(4, 3), conv_stride=(2, 2),
        num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
    )
    return hf, ours_cfg


class TestHubertParity:
    def test_forward_matches_hf(self):
        hf, cfg = _tiny_pair()
        variables = convert_hubert_state_dict(hf.state_dict(), cfg)
        model = HubertModel(cfg)

        rng = np.random.RandomState(0)
        wav = rng.randn(2, 1600).astype(np.float32)

        with torch.no_grad():
            ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()

        import jax.numpy as jnp
        got = np.asarray(model.apply(variables, jnp.asarray(wav)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)

    def test_frame_count_formula(self):
        hf, cfg = _tiny_pair()
        # total stride 4, receptive field: 4 + (3-1)*2 = 8
        assert cfg.total_stride == 4
        assert cfg.receptive_field == 8
        variables = convert_hubert_state_dict(hf.state_dict(), cfg)
        import jax.numpy as jnp
        out = HubertModel(cfg).apply(variables, jnp.zeros((1, 100)))
        assert out.shape[1] == (100 - cfg.receptive_field) // cfg.total_stride + 1


class TestWav2Vec2Parity:
    """The generalized speech encoder must reproduce HF torch Wav2Vec2
    (post-LN layers, group-norm first conv, bias-free convs)."""

    def _tiny_pair(self, seed=0):
        hf_cfg = transformers.Wav2Vec2Config(
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=64,
            conv_dim=(16, 16),
            conv_kernel=(4, 3),
            conv_stride=(2, 2),
            num_conv_pos_embeddings=8,
            num_conv_pos_embedding_groups=4,
            do_stable_layer_norm=False,
            feat_extract_norm="group",
            feat_proj_dropout=0.0,
            hidden_dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
            layerdrop=0.0,
            conv_bias=False,
        )
        torch.manual_seed(seed)
        hf = transformers.Wav2Vec2Model(hf_cfg).eval()
        ours_cfg = HubertConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            conv_dim=(16, 16), conv_kernel=(4, 3), conv_stride=(2, 2),
            num_conv_pos_embeddings=8, num_conv_pos_embedding_groups=4,
            conv_norm="group_first", stable_layer_norm=False,
            conv_bias=False,
        )
        return hf, ours_cfg

    def test_forward_matches_hf(self):
        from diffsheg_tpu.compat.hubert_ckpt import convert_hubert_state_dict
        hf, cfg = self._tiny_pair()
        variables = convert_hubert_state_dict(hf.state_dict(), cfg)
        model = HubertModel(cfg)
        rng = np.random.RandomState(0)
        wav = rng.randn(2, 1600).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
        import jax.numpy as jnp
        got = np.asarray(model.apply(variables, jnp.asarray(wav)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)
