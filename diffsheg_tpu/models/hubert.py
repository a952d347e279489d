"""Flax HuBERT encoder (hubert-large-ls960-ft architecture).

The reference runs HuggingFace's torch HuBERT on GPU for 1024-d speech
features (trainers/ddpm_beat_trainer.py:1132-1137,1429-1475).  This is a
from-scratch Flax implementation of the same architecture so the whole audio
frontend executes under one jit on TPU; weights are converted from the
published torch checkpoint by ``diffsheg_tpu.compat.hubert_ckpt``.

Architecture (facebook/hubert-large-ls960-ft):
  - 7-layer conv feature extractor, 512 ch, kernels (10,3,3,3,3,2,2),
    strides (5,2,2,2,2,2,2), per-layer LayerNorm ("layer" norm mode),
    total stride 320, receptive field 400.
  - feature projection: LN(512) -> Dense(1024).
  - convolutional relative positional embedding: grouped conv k=128, g=16.
  - 24 pre-LN ("stable layer norm") transformer layers, 16 heads, FFN 4096.
  - final LayerNorm.
"""

from __future__ import annotations

import dataclasses


import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

LN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    # architecture family switches (wav2vec2-base uses group-norm on the
    # first conv layer only and post-LN transformer layers)
    conv_norm: str = "layer"        # {"layer", "group_first"}
    conv_bias: bool = True          # wav2vec2-base convs are bias-free
    stable_layer_norm: bool = True  # True: pre-LN (hubert-large); False:
                                    # post-LN (wav2vec2-base)
    dtype: str = "float32"

    @property
    def total_stride(self) -> int:
        return int(np.prod(self.conv_stride))

    @property
    def receptive_field(self) -> int:
        # kernel of the equivalent single conv: k_eq = sum((k_i - 1) * prod(s_<i)) + 1
        rf, stride = 1, 1
        for k, s in zip(self.conv_kernel, self.conv_stride):
            rf += (k - 1) * stride
            stride *= s
        return rf


def hubert_large_config() -> HubertConfig:
    return HubertConfig()


def wav2vec2_base_config() -> HubertConfig:
    """facebook/wav2vec2-base-960h geometry: 768-d, 12 post-LN layers,
    group-norm first conv layer."""
    return HubertConfig(
        hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, conv_norm="group_first",
        stable_layer_norm=False, conv_bias=False,
    )


class ConvFeatureExtractor(nn.Module):
    """Strided conv stack: per-layer LayerNorm (hubert "layer" mode) or
    first-layer GroupNorm only (wav2vec2 "group_first" mode)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, N) -> (B, T, C)
        dtype = jnp.dtype(self.cfg.dtype)
        h = x[..., None].astype(dtype)  # (B, N, 1)
        group_first = self.cfg.conv_norm == "group_first"
        for i, (c, k, s) in enumerate(zip(self.cfg.conv_dim,
                                          self.cfg.conv_kernel,
                                          self.cfg.conv_stride)):
            h = nn.Conv(c, (k,), strides=(s,), padding="VALID",
                        use_bias=self.cfg.conv_bias,
                        dtype=dtype, name=f"conv_{i}")(h)
            if group_first:
                if i == 0:
                    # torch GroupNorm(num_groups=C, num_channels=C) on
                    # (B, C, T): each channel normalized over time
                    mean = h.mean(axis=-2, keepdims=True)
                    var = h.var(axis=-2, keepdims=True)
                    h = (h - mean) * jax.lax.rsqrt(var + LN_EPS)
                    h = h * self.param(
                        "gn_scale", nn.initializers.ones, (c,))                         + self.param("gn_bias", nn.initializers.zeros, (c,))
            else:
                h = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype,
                                 name=f"ln_{i}")(h)
            h = jax.nn.gelu(h, approximate=False)
        return h


class PosConvEmbed(nn.Module):
    """Grouped conv positional embedding with 'same' padding k//2 each side,
    trimming one frame when the kernel is even (the torch implementation's
    padding-remove trick)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, H)
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        k = c.num_conv_pos_embeddings
        h = nn.Conv(
            c.hidden_size, (k,), padding=[(k // 2, k // 2)],
            feature_group_count=c.num_conv_pos_embedding_groups,
            dtype=dtype, name="conv",
        )(x)
        if k % 2 == 0:
            h = h[:, :-1]
        return jax.nn.gelu(h, approximate=False)


class HubertSelfAttention(nn.Module):
    cfg: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array,
                 frame_mask: jax.Array | None = None) -> jax.Array:
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        B, T, H = x.shape
        nh = c.num_heads
        hd = H // nh
        q = nn.Dense(H, dtype=dtype, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(H, dtype=dtype, name="k_proj")(x)
        v = nn.Dense(H, dtype=dtype, name="v_proj")(x)
        q = q.reshape(B, T, nh, hd)
        k = k.reshape(B, T, nh, hd)
        v = v.reshape(B, T, nh, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if frame_mask is not None:
            # additive key mask (the HF masked path): padded frames get
            # zero softmax weight, so valid frames equal a natural-length
            # (unpadded) forward bit-for-bit
            logits = jnp.where(frame_mask[:, None, None, :], logits,
                               jnp.float32(-1e9))
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(dtype)
        return nn.Dense(H, dtype=dtype, name="out_proj")(out.reshape(B, T, H))


class HubertEncoderLayer(nn.Module):
    """Transformer layer: pre-LN (do_stable_layer_norm=True, hubert-large)
    or post-LN (wav2vec2-base)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, x: jax.Array,
                 frame_mask: jax.Array | None = None) -> jax.Array:
        c = self.cfg
        dtype = jnp.dtype(c.dtype)

        def ffn(h):
            h = nn.Dense(c.intermediate_size, dtype=dtype, name="fc1")(h)
            h = jax.nn.gelu(h, approximate=False)
            return nn.Dense(c.hidden_size, dtype=dtype, name="fc2")(h)

        if c.stable_layer_norm:
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="attn_ln")(x)
            x = x + HubertSelfAttention(c, name="attn")(h, frame_mask)
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="ffn_ln")(x)
            return x + ffn(h)
        x = x + HubertSelfAttention(c, name="attn")(x, frame_mask)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="attn_ln")(x)
        x = x + ffn(x)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="ffn_ln")(x)


class _ScanBody(nn.Module):
    """nn.scan adapter: (carry, broadcast mask) -> (carry, None)."""

    cfg: HubertConfig

    @nn.compact
    def __call__(self, h, frame_mask):
        h = HubertEncoderLayer(self.cfg, name="layer")(h, frame_mask)
        return h, None


class HubertModel(nn.Module):
    """Waveform (B, N) at 16 kHz -> hidden states (B, T, 1024), T=(N-400)//320+1.

    ``frame_mask`` (B, T) bool marks valid conv-output frames when rows are
    right-padded to a static length (the chunked extractor pads its remainder
    chunk, audio/hubert_runner.py).  Semantics follow HF's masked path:
    pad hidden states are zeroed before the positional conv and excluded
    from attention, so the valid frames equal a natural-length forward —
    without it, pad frames leak into every frame through softmax attention.

    ``scan_layers`` runs the 24 identical transformer layers as ONE
    ``lax.scan`` over layer-stacked parameters instead of 24 unrolled
    blocks: same math (tests pin equality), ~24x less HLO — the unrolled
    encoder dominated the train-step compile when the speech frontend
    moved on device.  Parameter layout differs (one ``layers/layer``
    subtree with a leading layer axis); convert an unrolled tree with
    :func:`stack_layer_params`.
    """

    cfg: HubertConfig
    scan_layers: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 frame_mask: jax.Array | None = None) -> jax.Array:
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        h = ConvFeatureExtractor(c, name="feature_extractor")(x)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="feat_proj_ln")(h)
        h = nn.Dense(c.hidden_size, dtype=dtype, name="feat_proj")(h)
        if frame_mask is not None:
            # zero pad positions so the positional conv sees the same zeros
            # torch's implicit end-of-sequence conv padding provides
            h = h * frame_mask[..., None].astype(h.dtype)
        h = h + PosConvEmbed(c, name="pos_conv")(h)
        if not c.stable_layer_norm:
            # wav2vec2: LN after the positional conv, none at the end
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="final_ln")(h)
        if self.scan_layers:
            scanned = nn.scan(
                _ScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=c.num_layers,
            )(c, name="layers")
            h, _ = scanned(h, frame_mask)
        else:
            for i in range(c.num_layers):
                h = HubertEncoderLayer(c, name=f"layer_{i}")(h, frame_mask)
        if c.stable_layer_norm:
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, name="final_ln")(h)
        return h


def stack_layer_params(variables, num_layers: int):
    """Unrolled layer tree (``layer_0`` .. ``layer_{N-1}``) -> the
    ``scan_layers=True`` layout (one ``layers/layer`` subtree whose leaves
    gain a leading layer axis).  Use on converted HF checkpoints or any
    variables initialised with ``scan_layers=False``."""
    params = dict(variables["params"])
    per_layer = [params.pop(f"layer_{i}") for i in range(num_layers)]
    params["layers"] = {"layer": jax.tree.map(
        lambda *xs: jnp.stack(xs), *per_layer)}
    return {**variables, "params": params}


def normalize_waveform(x: jax.Array, axis: int = -1, eps: float = 1e-7) -> jax.Array:
    """Wav2Vec2Processor zero-mean/unit-variance normalisation (the reference
    applies it before HuBERT, ddpm_beat_trainer.py:1434)."""
    mean = x.mean(axis=axis, keepdims=True)
    var = x.var(axis=axis, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)
