"""UniDiffuser: joint expression + gesture denoiser.

Re-design of reference models/transformer.py:590-770.  Structure:

  1. a single-layer audio encoder over the mel features (with the reference's
     input-doubling residual quirk, needed for checkpoint parity);
  2. the expression branch denoises the face channels;
  3. the predicted expression epsilon is converted to an x0 estimate at the
     current noise level (``stop_gradient`` — the x0 bridge, :749) and fed to
     the gesture branch as an additional condition;
  4. outputs are re-concatenated in (gesture, expression) channel order.

The ``sqrt_alphas`` pair is passed in by the sampler/loss (computed from the
active — possibly respaced — schedule), exactly like the reference threads it
through ``model_kwargs`` (gaussian_diffusion.py:527-532).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsheg_tpu.config import ModelConfig
from diffsheg_tpu.models.blocks import DiffusionTransformerLayer
from diffsheg_tpu.models.denoiser import MotionDenoiser, TimeEmbedMLP
from diffsheg_tpu.models.embeddings import timestep_embedding


class UniDiffuser(nn.Module):
    """Joint denoiser.  ``cfg`` is the static architecture config."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                       # (B, T, pose+expr) noisy motion
        t: jax.Array,                       # (B,) original-process timesteps
        sqrt_alphas: Tuple[jax.Array, jax.Array],  # broadcastable to (B, T, expr)
        audio_mel: jax.Array,               # (B, T, audio_dim)
        person_id: jax.Array,               # (B, style_dim)
        hubert: Optional[jax.Array] = None, # (B, T, hubert_dim)
        word: Optional[jax.Array] = None,   # (B, T) int token ids
        emo: Optional[jax.Array] = None,    # (B, T) int emotion labels
        train: bool = False,
        cfg_inference: bool = False,
        cache=None,  # Optional[level_cache.ModelCache] — sampling fast path
    ) -> jax.Array:
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        B, T, _ = x.shape

        if cache is None:
            # Top-level time embedding drives the audio encoder's stylization
            # blocks (transformer.py:623-627, :730).
            emb = TimeEmbedMLP(c.time_embed_dim, dtype=dtype,
                               name="time_embed")(
                timestep_embedding(t, c.latent_dim).astype(dtype)
            )
            src_mask = jnp.ones((B, T, 1), dtype=dtype)

            # 1. audio encoder: one layer at latent = audio_dim, no condition.
            audio_feat = DiffusionTransformerLayer(
                c.audio_dim, c.ff_size, c.num_heads, dtype=dtype,
                dropout=c.dropout, name="encoder_aud"
            )(audio_mel.astype(dtype), None, emb, src_mask, train=train)
            audio_emb = jnp.concatenate(
                [audio_mel.astype(dtype), audio_feat], axis=-1)
        else:
            # audio encoder + all per-level embeddings were precomputed for
            # every timestep level (models/level_cache.py); the branches read
            # their projections straight from the cache.
            audio_emb = None

        gesture, expression = jnp.split(x, [c.pose_dim], axis=-1)

        branch_kw = dict(
            audio_dim=c.audio_dim * 2,
            aud_latent_dim=c.aud_latent_dim,
            latent_dim=c.latent_dim,
            ff_size=c.ff_size,
            num_layers=c.num_layers,
            num_heads=c.num_heads,
            style_dim=c.style_dim,
            pe_type=c.pe_type,
            max_seq_len=c.max_seq_len,
            encode_hubert=c.encode_hubert,
            hubert_latent_dim=c.hubert_latent_dim,
            speech_encoder=c.speech_encoder,
            classifier_free=c.classifier_free,
            null_cond_prob=c.null_cond_prob,
            cond_scale=c.cond_scale,
            learned_variance=c.learned_variance,
            remat=c.remat,
            scan_layers=c.scan_layers,
            model_base=c.model_base,
            dropout=c.dropout,
            word_f=c.word_f, emotion_f=c.emotion_f,
            word_vocab=c.word_vocab, num_emotions=c.num_emotions,
            dtype=dtype,
        )
        text_kw = dict(word=word if c.add_text_cond else None,
                       emo=emo if c.add_emo_cond else None)

        # 2. expression branch.
        exp_out = MotionDenoiser(
            input_feats=c.expression_dim,
            use_pid_embed=not c.expr_id_off,
            name="encoder_exp",
            **branch_kw,
        )(
            expression, t, audio_emb, person_id,
            hubert=hubert, train=train, cfg_inference=cfg_inference,
            cache=None if cache is None else cache.exp,
            **text_kw,
        )
        # with a learned-variance head each branch emits (mean ++ var_raw)
        exp_eps = exp_out[..., : c.expression_dim] if c.learned_variance \
            else exp_out

        # 3. x0 bridge: eps -> x0 at the current noise level, detached
        # (transformer.py:717-724, :749).
        sr, srm1 = sqrt_alphas
        expr_x0 = jax.lax.stop_gradient(sr * expression - srm1 * exp_eps)

        # 4. gesture branch conditioned on the predicted expression.
        ges_out = MotionDenoiser(
            input_feats=c.pose_dim,
            use_pid_embed=True,
            name="encoder_ges",
            **branch_kw,
        )(
            gesture, t, audio_emb, person_id,
            hubert=hubert, exp_cond=expr_x0,
            train=train, cfg_inference=cfg_inference,
            cache=None if cache is None else cache.ges,
            **text_kw,
        )

        if c.learned_variance:
            # reassemble to the sampler's channel-last 2C layout: the first C
            # channels are the joint mean (gesture ++ expression), the second
            # C the joint raw variance — matching split_model_output and the
            # reference's dim-1 split (gaussian_diffusion.py:549-552)
            return jnp.concatenate(
                [ges_out[..., : c.pose_dim], exp_eps,
                 ges_out[..., c.pose_dim:], exp_out[..., c.expression_dim:]],
                axis=-1)
        return jnp.concatenate([ges_out, exp_eps], axis=-1)


def init_unidiffuser(
    cfg: ModelConfig, n_poses: int, rng: jax.Array, batch: int = 1
):
    """Initialise model variables with dummy inputs; returns (model, variables)."""
    model = UniDiffuser(cfg)
    x = jnp.zeros((batch, n_poses, cfg.motion_dim))
    t = jnp.zeros((batch,), dtype=jnp.int32)
    sa = (jnp.ones((batch, 1, 1)), jnp.ones((batch, 1, 1)))
    mel = jnp.zeros((batch, n_poses, cfg.audio_dim))
    pid = jnp.zeros((batch, cfg.style_dim))
    hub = jnp.zeros((batch, n_poses, cfg.hubert_dim)) if cfg.add_hubert else None
    kw = {}
    if cfg.add_text_cond:
        kw["word"] = jnp.zeros((batch, n_poses), dtype=jnp.int32)
    if cfg.add_emo_cond:
        kw["emo"] = jnp.zeros((batch, n_poses), dtype=jnp.int32)
    # init on the HOST CPU backend: eager flax init executes the forward
    # op-by-op (one network round-trip per op on a remote-attached device
    # — 10+ minutes measured), and jitting it pays a full-model compile
    # for a once-used program.  Params don't need the accelerator; they
    # are returned as numpy and upload in bulk wherever first used.
    from diffsheg_tpu.models.factory import host_init
    variables = host_init(model.init, rng, x, t, sa, mel, pid, hubert=hub,
                          train=False, **kw)
    return model, variables
