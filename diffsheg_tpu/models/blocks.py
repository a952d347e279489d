"""Denoiser building blocks (Flax).

Re-designs of the reference's transformer internals
(models/transformer.py:71-346) with identical math:

- ``StylizationBlock``: AdaLN time/style modulation, zero-initialised output
  projection so each block starts as identity (:71-97).
- ``FFN``: GELU MLP with zero-init second linear + stylization (:168-181).
- ``DiffusionTransformerLayer``: per-layer condition injection — the layer
  input is re-concatenated with the audio latent (and extra conditions),
  passed through an MLP projection with residual, optionally substituted by a
  learned null-condition embedding for classifier-free guidance (:247-346).

TPU notes: all feature dims are multiples of 128 where the architecture
permits; matmuls run in ``dtype`` (bfloat16 in production) with float32
params; no data-dependent shapes anywhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsheg_tpu.models.attention import LinearTemporalSelfAttention

# torch-parity constants: LayerNorm eps (torch default 1e-5) and exact GELU.
LN_EPS = 1e-5


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


class StylizationBlock(nn.Module):
    """AdaLN modulation: ``out(norm(h) * (1 + scale) + shift)``.

    The scale/shift come from the (time [+ speaker]) embedding; the output
    linear is zero-initialised so the surrounding residual starts as identity
    (reference models/transformer.py:71-97 with zero_module :62-68).
    """

    latent_dim: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, h: jax.Array, emb: Optional[jax.Array],
                 train: bool = False,
                 mod: Optional[jax.Array] = None) -> jax.Array:
        # emb: (B, E) -> (B, 1, 2*latent); a precomputed ``mod`` (B, 2*latent)
        # from the timestep-level cache (models/level_cache.py) skips the
        # emb_proj matmul — its weights are then read once per window, not
        # once per denoise step.
        if mod is None:
            mod = nn.Dense(2 * self.latent_dim, dtype=self.dtype,
                           name="emb_proj")(nn.silu(emb))
        mod = mod[:, None, :]
        scale, shift = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(h)
        h = h * (1.0 + scale) + shift
        # out_layers = SiLU -> Dropout -> zero Linear (transformer.py:80-84)
        h = nn.Dropout(self.dropout)(nn.silu(h), deterministic=not train)
        h = nn.Dense(
            self.latent_dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="out_proj",
        )(h)
        return h


class FFN(nn.Module):
    """Position-wise GELU MLP with stylization residual
    (reference models/transformer.py:168-181)."""

    latent_dim: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, emb: Optional[jax.Array],
                 train: bool = False,
                 mod: Optional[jax.Array] = None) -> jax.Array:
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(x)
        # linear2(dropout(gelu(linear1(x)))) (transformer.py:179)
        y = nn.Dropout(self.dropout)(gelu_exact(y), deterministic=not train)
        y = nn.Dense(
            self.latent_dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="linear2",
        )(y)
        y = StylizationBlock(self.latent_dim, dtype=self.dtype,
                             dropout=self.dropout, name="proj_out"
                             )(y, emb, train=train, mod=mod)
        return x + y


class CondProjection(nn.Module):
    """The 'mlp' condition projection: LN -> Dense(2L) -> SiLU -> Dense(L)
    (reference models/transformer.py:284-289)."""

    latent_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * self.latent_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        return nn.Dense(self.latent_dim, dtype=self.dtype, name="fc2")(x)


class DiffusionTransformerLayer(nn.Module):
    """One denoiser layer: condition re-injection + linear self-attention + FFN.

    Condition injection (reference models/transformer.py:300-338, shipped
    config ``mlp_includeX`` + ``cond_residual``): the running latent is
    concatenated with the audio latent and any extra conditions, projected
    back to ``latent_dim`` by an MLP, and added to the pre-concat latent.

    Classifier-free guidance substitutes the whole concatenated condition
    vector with a learned ``null_cond_emb`` for selected batch rows
    (:326-332); the row mask is supplied by the caller so train
    (deterministic first-fraction, :328) and inference (first half of the
    doubled batch, :331) share this code.
    """

    latent_dim: int
    ffn_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0
    # 'transformer_encoder' (shipped): per-layer condition concat+projection.
    # 'transformer_decoder': no concat — linear cross-attention over the
    # condition after the self-attention instead (reference
    # transformer.py:294-296,344-346 and the working `_2` layer variant
    # :183-245; the primary layer's decoder branch at :260,331 would hit a
    # missing feat_proj, so the `_2` semantics are the functional contract).
    model_base: str = "transformer_encoder"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                     # (B, T, L)
        cond: Optional[jax.Array],        # (B, T, C_cond) or None
        emb: Optional[jax.Array],         # (B, E) time(+style) embedding
        src_mask: jax.Array,              # (B, T, 1)
        null_cond_mask: Optional[jax.Array] = None,  # (B,) bool: use null cond
        null_cond_emb: Optional[jax.Array] = None,   # (1, L + C_cond)
        train: bool = False,
        mods: Optional[jax.Array] = None,  # (2, B, 2*latent) level-cache mods
    ) -> jax.Array:
        if self.model_base == "transformer_decoder":
            from diffsheg_tpu.models.attention import (
                LinearTemporalCrossAttention)
            x = LinearTemporalSelfAttention(
                self.latent_dim, self.num_heads, dtype=self.dtype,
                dropout=self.dropout, name="sa_block"
            )(x, emb, src_mask, train=train,
              mod=None if mods is None else mods[0])
            if cond is not None:
                x = LinearTemporalCrossAttention(
                    self.latent_dim, self.num_heads, dtype=self.dtype,
                    dropout=self.dropout, name="ca_block"
                )(x, cond, emb, train=train)
            return FFN(self.latent_dim, self.ffn_dim, dtype=self.dtype,
                       dropout=self.dropout, name="ffn")(
                x, emb, train=train, mod=None if mods is None else mods[1])

        if cond is not None:
            x_ori = x
            feats = jnp.concatenate([x, cond], axis=-1)
            if null_cond_mask is not None:
                assert null_cond_emb is not None
                null = jnp.broadcast_to(
                    null_cond_emb[:, None, :].astype(feats.dtype), feats.shape
                )
                feats = jnp.where(null_cond_mask[:, None, None], null, feats)
            x = CondProjection(self.latent_dim, dtype=self.dtype, name="feat_proj")(feats)
            x = x + x_ori
        else:
            # Reference quirk kept for checkpoint parity: with no condition the
            # residual save/restore doubles the input (transformer.py:302,337).
            x = x + x

        # NOTE: the reference's attention-level nn.Dropout is constructed but
        # never called in forward (transformer.py:109,112-130) — only the
        # StylizationBlock inside the attention residual drops.
        x = LinearTemporalSelfAttention(
            self.latent_dim, self.num_heads, dtype=self.dtype,
            dropout=self.dropout, name="sa_block"
        )(x, emb, src_mask, train=train,
          mod=None if mods is None else mods[0])
        x = FFN(self.latent_dim, self.ffn_dim, dtype=self.dtype,
                dropout=self.dropout, name="ffn")(
            x, emb, train=train, mod=None if mods is None else mods[1])
        return x
