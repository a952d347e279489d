"""Timestep and positional embeddings.

Covers the reference's sinusoidal timestep embedding
(models/transformer.py:42-59) and the PeriodicPositionalEncoding family
(:19-38, :386-395).  All tables are precomputed at trace time from static
shapes, so inside jit they are constants folded into the executable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding of (possibly fractional) timesteps.

    Layout parity with reference models/transformer.py:42-59: ``[cos | sin]``
    (guided-diffusion convention), frequencies ``exp(-log(P) * i / half)``.

    Args:
      t: (B,) float or int timesteps.
      dim: embedding width.
    Returns:
      (B, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def sinusoidal_position_table(period: int, d_model: int) -> np.ndarray:
    """Interleaved sin/cos position table, (period, d_model) float32.

    Matches the transformer-standard layout used by the reference PE
    (models/transformer.py:22-27): even channels sin, odd channels cos.
    Host numpy: called at module setup with static shapes.
    """
    position = np.arange(period, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model)
    )
    table = np.zeros((period, d_model), dtype=np.float64)
    table[:, 0::2] = np.sin(position * div_term)
    table[:, 1::2] = np.cos(position * div_term[: table[:, 1::2].shape[1]])
    return table.astype(np.float32)


def positional_encoding(
    pe_type: str, seq_len: int, d_model: int, max_seq_len: int = 600
) -> np.ndarray:
    """The PE table for a given variant, truncated to ``seq_len``.

    Variants (reference models/transformer.py:386-395):
      - 'pe_sinu'        period-600 sinusoid (default shipped config)
      - 'ppe_sinu'       period-25 sinusoid tiled — periodic PE
      - 'pe_sinu_repeat' period-200 sinusoid tiled
    'learnable' is a parameter and handled by the module, not here.
    """
    if pe_type in ("pe_sinu",):
        period = max_seq_len
    elif pe_type in ("ppe_sinu", "ppe_sinu_dropout"):
        period = 25
    elif pe_type == "pe_sinu_repeat":
        period = 200
    else:
        raise ValueError(f"unsupported pe_type {pe_type!r}")
    table = sinusoidal_position_table(period, d_model)
    reps = seq_len // period + 1
    tiled = np.tile(table, (reps, 1))
    return tiled[:seq_len]
