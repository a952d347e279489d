"""Linear (efficient) temporal attention.

The reference's core mixing op (models/transformer.py:100-131): Q is
softmax-normalised over the per-head feature dim, K over the time dim, and
attention is the O(T * d^2 / H) bilinear form

    ctx  = sum_t K[t] (x) V[t]          # (B, H, hd, hd)
    y[t] = Q[t] @ ctx                   # (B, T, H, hd)

This maps naturally onto the MXU as two batched matmuls; XLA fuses the
norm/QKV projections and softmaxes around them.  A fused Pallas kernel for
the two-einsum core lives in ``diffsheg_tpu.ops.linear_attention`` and is
used when the shapes make it profitable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

LN_EPS = 1e-5


def linear_attention_core(
    q: jax.Array,  # (B, T, H, hd) — softmaxed over hd
    k: jax.Array,  # (B, T, H, hd) — softmaxed over T
    v: jax.Array,  # (B, T, H, hd) — masked
) -> jax.Array:
    """The two-einsum linear-attention contraction, fp32 accumulation."""
    ctx = jnp.einsum("bnhd,bnhl->bhdl", k, v, preferred_element_type=jnp.float32)
    y = jnp.einsum(
        "bnhd,bhdl->bnhl", q, ctx.astype(q.dtype), preferred_element_type=jnp.float32
    )
    return y.astype(q.dtype)


class LinearTemporalSelfAttention(nn.Module):
    """Reference models/transformer.py:100-131 with identical masking:
    the key logits get ``(1 - mask) * -1e6`` before the time softmax and the
    values are zeroed outside the mask.

    ``use_fused=None`` auto-selects the fused Pallas kernel
    (diffsheg_tpu.ops.linear_attention) on TPU backends and the einsum
    composition elsewhere; both paths are numerically equivalent and
    differentiable."""

    latent_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_fused: bool = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, emb, src_mask: jax.Array,
                 train: bool = False, mod=None) -> jax.Array:
        from diffsheg_tpu.models.blocks import StylizationBlock  # circular-safe
        from diffsheg_tpu.ops.linear_attention import linear_attention

        B, T, D = x.shape

        xn = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        query = nn.Dense(D, dtype=self.dtype, name="query")(xn)
        key = nn.Dense(D, dtype=self.dtype, name="key")(xn)
        value = nn.Dense(D, dtype=self.dtype, name="value")(xn)

        mask = src_mask.astype(query.dtype)  # (B, T, 1)
        key = key + (1.0 - mask) * -1_000_000.0
        value = value * mask

        y = linear_attention(query, key, value, self.num_heads,
                             use_fused=self.use_fused)
        y = StylizationBlock(self.latent_dim, dtype=self.dtype,
                             dropout=self.dropout, name="proj_out"
                             )(y, emb, train=train, mod=mod)
        return x + y


class LinearTemporalCrossAttention(nn.Module):
    """Linear cross-attention from the motion latent onto an external memory
    (the audio latent) — reference models/transformer.py:133-166, used when
    ``model_base='transformer_decoder'`` (:344-346).

    Same two-einsum contraction as the self-attention; queries come from the
    normalised motion latent, keys/values from a separately-normalised memory
    ``xf``.  The reference applies no mask on this path and its nn.Dropout is
    constructed but never called — reproduced faithfully.
    """

    latent_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, xf: jax.Array, emb,
                 train: bool = False, mod=None) -> jax.Array:
        from diffsheg_tpu.models.blocks import StylizationBlock  # circular-safe
        from diffsheg_tpu.ops.linear_attention import linear_attention

        B, T, D = x.shape
        xn = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        xfn = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype,
                           name="text_norm")(xf)
        query = nn.Dense(self.latent_dim, dtype=self.dtype, name="query")(xn)
        key = nn.Dense(self.latent_dim, dtype=self.dtype, name="key")(xfn)
        value = nn.Dense(self.latent_dim, dtype=self.dtype, name="value")(xfn)

        y = linear_attention(query, key, value, self.num_heads)
        y = StylizationBlock(self.latent_dim, dtype=self.dtype,
                             dropout=self.dropout, name="proj_out"
                             )(y, emb, train=train, mod=mod)
        return x + y
