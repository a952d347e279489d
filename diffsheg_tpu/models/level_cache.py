"""Timestep-level conditioning cache for the sampler hot loop.

Every reverse-process step re-runs the full denoiser.  A large share of its
weights — the StylizationBlock ``emb_proj`` matrices, the time/speaker
embedding MLPs, the one-layer audio encoder, the audio/HuBERT condition
projections — produce values that depend only on (timestep level, speaker,
window audio), NOT on the sample ``x``.  In the reference every CUDA step
re-reads and re-computes all of it (models/transformer.py:496-587 runs per
call); on TPU the sampler is one fused scan, so those weights are otherwise
re-streamed from HBM on every one of the ~25-40 scan steps.

This module precomputes all of it once, ahead of the scan (measured 1.8x
fewer microseconds per denoise step on TPU v5e for the shipped BEAT
architecture).  It is split in two so a windowed stream pays each part at
the right cadence:

  - :func:`build_static_cache` — per-branch time(+speaker) embeddings and
    all 2*num_layers stylization modulation vectors for every timestep
    level.  Depends only on (levels, pid): built ONCE per stream.
  - :func:`build_audio_cache` — the one-layer audio encoder, the per-branch
    ``audio_proj`` and HuBERT encoders.  Depends on the window audio; a
    streamer folds ALL windows into the batch so this is one MXU-shaped
    matmul batch instead of per-window skinny ones.
  - :func:`combine` / :func:`build_level_cache` — assemble the per-window
    :class:`ModelCache` the denoiser consumes.

Numerical parity is by construction: the builders apply the *same Flax
submodules* on their own variable subtrees (no re-implemented math), so a
cached forward equals the uncached forward exactly (see
tests/test_level_cache.py).

Cacheable vs dynamic split of the UniDiffuser forward
(models/unidiffuser.py, models/denoiser.py):

  static per level       per-branch time_embed(+pid_embed), all
                         StylizationBlock modulation vectors
  audio per (window, L)  top time_embed -> encoder_aud layer -> audio_proj
  audio per window       hubert conv/linear encoder (t-independent)
  dynamic per step       joint_embed+PE, feat_proj (consumes x), attention
                         QKV + core, FFN linears, out head, x0 bridge, CFG
                         doubling/merge and null-cond substitution
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsheg_tpu.config import ModelConfig
from diffsheg_tpu.models.blocks import DiffusionTransformerLayer
from diffsheg_tpu.models.denoiser import HubertConvEncoder, TimeEmbedMLP
from diffsheg_tpu.models.embeddings import timestep_embedding


class BranchCache(NamedTuple):
    """Per-branch precomputed conditioning, as consumed by MotionDenoiser.

    Leveled form (as built): ``mods``/``audio_lat`` carry a leading level
    axis ``L``; after :func:`gather_level` they are per-step tensors.
    """

    mods: jax.Array                     # (L, num_layers, 2, B, 2*latent)
    audio_lat: jax.Array                # (L, B, T, aud_latent)
    hubert_lat: Optional[jax.Array]     # (B, T, hubert_latent) — level-free


class ModelCache(NamedTuple):
    exp: BranchCache
    ges: BranchCache


class StaticCache(NamedTuple):
    """Window-independent part: stylization modulations per branch."""

    exp_mods: jax.Array                 # (L, num_layers, 2, B, 2*latent)
    ges_mods: jax.Array


class AudioCache(NamedTuple):
    """Window-dependent part.  A leading window axis K may be present on
    every field (fold windows into the batch when building)."""

    exp_audio: jax.Array                # ([K,] L, B, T, aud_latent)
    ges_audio: jax.Array
    exp_hub: Optional[jax.Array]        # ([K,] B, T, hubert_latent)
    ges_hub: Optional[jax.Array]


def supports_level_cache(cfg: ModelConfig) -> bool:
    """The cache covers the shipped joint model; rare conditioning variants
    fall back to the uncached forward.

    The decoder base has no per-layer feat_proj (its cross-attention takes
    the raw condition), and a learned-variance head changes the output
    width and the UniDiffuser x0 bridge — both take the general path.
    """
    return (
        cfg.branch_mode == "joint"
        and not cfg.add_text_cond
        and not cfg.add_emo_cond
        and cfg.model_base == "transformer_encoder"
        and not cfg.learned_variance
    )


def _dense(p, features: int, dtype, x: jax.Array) -> jax.Array:
    return nn.Dense(features, dtype=dtype).apply({"params": p}, x)


def _branch_mods(
    cfg: ModelConfig, p, use_pid: bool, t_levels: jax.Array,
    pid: jax.Array, dtype, L: int, B: int,
) -> jax.Array:
    E = cfg.time_embed_dim
    temb = TimeEmbedMLP(E, dtype=dtype).apply(
        {"params": p["time_embed"]},
        timestep_embedding(t_levels, cfg.latent_dim).astype(dtype),
    )                                                       # (L, E)
    emb = jnp.broadcast_to(temb[:, None], (L, B, E))
    if use_pid:
        pemb = TimeEmbedMLP(E, dtype=dtype).apply(
            {"params": p["pid_embed"]}, pid.astype(dtype)
        )                                                   # (B, E)
        emb = emb + pemb[None]

    s = nn.silu(emb).reshape(L * B, E)
    mods = []
    for i in range(cfg.num_layers):
        lp = p[f"layer_{i}"]
        m_sa = _dense(lp["sa_block"]["proj_out"]["emb_proj"],
                      2 * cfg.latent_dim, dtype, s)
        m_ffn = _dense(lp["ffn"]["proj_out"]["emb_proj"],
                       2 * cfg.latent_dim, dtype, s)
        mods.append(jnp.stack([m_sa, m_ffn]))               # (2, L*B, 2*lat)
    stacked = jnp.stack(mods)                               # (n, 2, L*B, 2*lat)
    stacked = stacked.reshape(cfg.num_layers, 2, L, B, 2 * cfg.latent_dim)
    return stacked.transpose(2, 0, 1, 3, 4)                 # (L, n, 2, B, 2*lat)


def _branch_hubert(cfg: ModelConfig, p, bs,
                   hubert: Optional[jax.Array], dtype) -> Optional[jax.Array]:
    if hubert is None:
        return None
    mode = cfg.speech_encoder if cfg.encode_hubert else "raw"
    if mode == "conv":
        hv = {"params": p["hubert_encoder"]}
        if bs is not None and "hubert_encoder" in bs:
            hv["batch_stats"] = bs["hubert_encoder"]
        return HubertConvEncoder(cfg.hubert_latent_dim, dtype=dtype).apply(
            hv, hubert.astype(dtype), train=False
        )
    if mode == "linear":
        return _dense(p["hubert_encoder"], cfg.hubert_latent_dim, dtype,
                      hubert.astype(dtype))
    return hubert.astype(dtype)


def build_static_cache(
    cfg: ModelConfig,
    variables,
    t_levels: jax.Array,    # (L,) ORIGINAL-process timesteps (timestep_map)
    pid: jax.Array,         # (B, style_dim) — post-ablation
) -> StaticCache:
    """Per-level stylization modulations for both branches (pid-dependent,
    audio-independent: build once per stream)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    params = variables["params"]
    L, B = t_levels.shape[0], pid.shape[0]
    return StaticCache(
        exp_mods=_branch_mods(cfg, params["encoder_exp"],
                              not cfg.expr_id_off, t_levels, pid, dtype, L, B),
        ges_mods=_branch_mods(cfg, params["encoder_ges"], True, t_levels,
                              pid, dtype, L, B),
    )


def build_audio_cache(
    cfg: ModelConfig,
    variables,
    t_levels: jax.Array,    # (L,)
    mel: jax.Array,         # (N, T, audio_dim) — N may fold windows*batch
    hubert: Optional[jax.Array],  # (N, T, hubert_dim)
) -> AudioCache:
    """Audio-encoder outputs + branch audio/HuBERT projections per level.

    ``N`` is a free batch axis: a windowed streamer passes all windows at
    once (N = K*B) so the whole frontend is one well-shaped matmul batch.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    L = t_levels.shape[0]
    N, T, A = mel.shape
    mel_c = mel.astype(dtype)

    # top-level time embedding drives the audio encoder's stylizations
    # (models/unidiffuser.py step 1)
    top_emb = TimeEmbedMLP(cfg.time_embed_dim, dtype=dtype).apply(
        {"params": params["time_embed"]},
        timestep_embedding(t_levels, cfg.latent_dim).astype(dtype),
    )                                                       # (L, E)

    mel_rep = jnp.broadcast_to(mel_c[None], (L, N, T, A)).reshape(L * N, T, A)
    emb_rep = jnp.repeat(top_emb, N, axis=0)                # (L*N, E)
    mask = jnp.ones((L * N, T, 1), dtype=dtype)
    audio_feat = DiffusionTransformerLayer(
        cfg.audio_dim, cfg.ff_size, cfg.num_heads, dtype=dtype,
        dropout=cfg.dropout,
    ).apply({"params": params["encoder_aud"]},
            mel_rep, None, emb_rep, mask, train=False)
    audio_emb = jnp.concatenate([mel_rep, audio_feat], axis=-1)

    def proj(branch):
        lat = _dense(params[branch]["audio_proj"], cfg.aud_latent_dim, dtype,
                     audio_emb)
        return lat.reshape(L, N, T, cfg.aud_latent_dim)

    return AudioCache(
        exp_audio=proj("encoder_exp"),
        ges_audio=proj("encoder_ges"),
        exp_hub=_branch_hubert(cfg, params["encoder_exp"],
                               bstats.get("encoder_exp"), hubert, dtype),
        ges_hub=_branch_hubert(cfg, params["encoder_ges"],
                               bstats.get("encoder_ges"), hubert, dtype),
    )


def combine(static: StaticCache, audio: AudioCache) -> ModelCache:
    """Assemble the per-window cache the denoiser consumes."""
    return ModelCache(
        exp=BranchCache(static.exp_mods, audio.exp_audio, audio.exp_hub),
        ges=BranchCache(static.ges_mods, audio.ges_audio, audio.ges_hub),
    )


def build_level_cache(
    cfg: ModelConfig,
    variables,
    t_levels: jax.Array,
    mel: jax.Array,         # (B, T, audio_dim) — post-ablation
    pid: jax.Array,         # (B, style_dim)   — post-ablation
    hubert: Optional[jax.Array],
) -> ModelCache:
    """Single-window convenience composition of the two builders."""
    return combine(
        build_static_cache(cfg, variables, t_levels, pid),
        build_audio_cache(cfg, variables, t_levels, mel, hubert),
    )


def gather_level(cache: ModelCache, level: jax.Array) -> ModelCache:
    """Select one timestep level (traced scalar index) from a leveled cache."""

    def g(b: BranchCache) -> BranchCache:
        return BranchCache(
            jax.lax.dynamic_index_in_dim(b.mods, level, keepdims=False),
            jax.lax.dynamic_index_in_dim(b.audio_lat, level, keepdims=False),
            b.hubert_lat,
        )

    return ModelCache(g(cache.exp), g(cache.ges))
