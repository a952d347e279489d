"""The per-branch motion denoiser (expression or gesture).

Re-design of reference ``MotionTransformer`` (models/transformer.py:349-587):
a stack of condition-injecting linear-attention layers driven by a fused
time(+speaker) embedding, with an optional HuBERT conv encoder and
classifier-free guidance.

Differences from the reference in *mechanism*, not behaviour:
  - CFG batch-doubling (:537-544) and the guidance merge (:585-587) are
    explicit, statically-shaped ops here (``cfg_inference`` flag) rather than
    mutable ``opt`` state.
  - The train-time null-condition rows use the reference's deterministic
    ``linspace(0,1,B) < p`` rule (:328) — reproduced exactly (it is *not*
    Bernoulli dropout) so converted checkpoints behave identically.
  - Positional tables are trace-time constants from static shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsheg_tpu.models.blocks import DiffusionTransformerLayer, gelu_exact
from diffsheg_tpu.models.embeddings import timestep_embedding, positional_encoding


class TimeEmbedMLP(nn.Module):
    """Dense -> SiLU -> Dense (reference models/transformer.py:446-450)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class HubertConvEncoder(nn.Module):
    """1024-d HuBERT features -> 128-d: Conv(k3) + BN + GELU + Conv(k3)
    (reference models/transformer.py:436-442).  Channel-last layout."""

    out_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(self.out_dim, (3,), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        x = gelu_exact(x)
        x = nn.Conv(self.out_dim, (3,), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        return x


class _ScanLayerNoMod(nn.Module):
    """nn.scan body for the transformer stack (no precomputed mods):
    carry = hidden state; everything else broadcast.  Params live under
    ``layers/layer`` with a leading layer axis (scan_layers layout)."""

    latent_dim: int
    ffn_dim: int
    num_heads: int
    dtype: jnp.dtype
    dropout: float
    model_base: str
    remat: bool = False

    def _layer_cls(self):
        if self.remat:
            return nn.remat(DiffusionTransformerLayer, static_argnums=(7,))
        return DiffusionTransformerLayer

    @nn.compact
    def __call__(self, h, cond, emb, src_mask, null_cond_mask,
                 null_cond_emb, train):
        h = self._layer_cls()(
            self.latent_dim, self.ffn_dim, self.num_heads,
            dtype=self.dtype, dropout=self.dropout,
            model_base=self.model_base, name="layer",
        )(h, cond, emb, src_mask, null_cond_mask, null_cond_emb, train,
          None)
        return h, None


class _ScanLayerMod(_ScanLayerNoMod):
    """Scan body for the level-cache path: per-layer stylization mods are
    the scanned-over xs (the cache already stacks them on a layer axis)."""

    @nn.compact
    def __call__(self, h, mod, cond, emb, src_mask, null_cond_mask,
                 null_cond_emb, train):
        h = self._layer_cls()(
            self.latent_dim, self.ffn_dim, self.num_heads,
            dtype=self.dtype, dropout=self.dropout,
            model_base=self.model_base, name="layer",
        )(h, cond, emb, src_mask, null_cond_mask, null_cond_emb, train,
          mod)
        return h, None


class MotionDenoiser(nn.Module):
    """One denoising branch.

    Inputs per call:
      x          (B, T, input_feats)  noisy motion channels
      t          (B,)                 original-process timesteps (for the embedding)
      audio      (B, T, audio_dim)    mel ++ encoded-audio latent (256-d)
      hubert     (B, T, 1024) | None  pretrained speech features
      exp_cond   (B, T, E) | None     predicted expression x0 (gesture branch)
      person_id  (B, style_dim)       speaker one-hot
    """

    input_feats: int
    audio_dim: int = 256           # branch-level conditioning width (mel*2)
    aud_latent_dim: int = 256
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 8
    style_dim: int = 30
    max_frames: int = 240
    pe_type: str = "pe_sinu"
    max_seq_len: int = 600
    use_pid_embed: bool = True     # False when ExprID_off on the expression branch
    encode_hubert: bool = True
    hubert_latent_dim: int = 128
    speech_encoder: str = "conv"   # {'conv','linear','raw'}
    classifier_free: bool = False
    null_cond_prob: float = 0.2
    cond_scale: float = 1.0
    dropout: float = 0.0
    model_base: str = "transformer_encoder"  # see DiffusionTransformerLayer
    # learned-variance head: the output projection emits 2x channels, the
    # second half being the raw variance interpolant consumed by
    # ModelVarType.LEARNED/LEARNED_RANGE sampling and the hybrid VLB loss
    # (reference gaussian_diffusion.py:549-566; the reference transformer
    # never grows its head — this completes the diffusion core's contract)
    learned_variance: bool = False
    # per-layer activation rematerialisation for training (backward-pass
    # recompute instead of stored activations; see the stack loop)
    remat: bool = False
    # run the num_layers identical transformer layers as ONE lax.scan over
    # layer-stacked parameters instead of an unrolled loop: same math
    # (tests pin equality), ~num_layers x less HLO — unrolled 8+8-layer
    # fwd+bwd programs exceed this environment's compile-service limits.
    # Parameter layout changes (one `layers/layer` subtree with a leading
    # layer axis); convert with models.factory.{stack,unstack}_scan_layers.
    scan_layers: bool = False
    # text/emotion conditioning (see ModelConfig.add_text_cond notes)
    word_f: int = 128
    emotion_f: int = 8
    word_vocab: int = 2048
    num_emotions: int = 8
    dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.latent_dim * 4

    def pre_proj_dim(self, has_hubert: bool, exp_cond_dim: int,
                     has_text: bool = False, has_emo: bool = False) -> int:
        d = self.latent_dim + self.aud_latent_dim + exp_cond_dim
        if has_hubert:
            d += self.hubert_latent_dim
        # word_f/emotion_f budgeting, reference transformer.py:409-412
        if has_text:
            d += self.word_f
        if has_emo:
            d += self.emotion_f
        return d

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        audio: jax.Array,
        person_id: jax.Array,
        hubert: Optional[jax.Array] = None,
        exp_cond: Optional[jax.Array] = None,
        word: Optional[jax.Array] = None,   # (B, T) int token ids
        emo: Optional[jax.Array] = None,    # (B, T) int emotion labels
        src_mask: Optional[jax.Array] = None,
        train: bool = False,
        cfg_inference: bool = False,
        cache=None,  # Optional[level_cache.BranchCache] — sampling fast path
    ) -> jax.Array:
        B, T, _ = x.shape
        compute = self.dtype

        if src_mask is None:
            src_mask = jnp.ones((B, T, 1), dtype=compute)

        # --- encode extra conditions ------------------------------------
        # concat order = the reference's add_cond dict insertion order
        # (pretrain_aud_feat, text, emo; transformer.py:512-536) with
        # exp_cond appended last
        cond_parts = []
        if cache is not None:
            # precomputed per-level conditioning (models/level_cache.py):
            # hubert/word/emo encoders, time/pid embeddings and all
            # stylization modulations were hoisted out of the sampler scan
            assert word is None and emo is None, \
                "level cache does not cover text/emo conditioning"
            if cache.hubert_lat is not None:
                cond_parts.append(cache.hubert_lat)
            hubert = None
        elif hubert is not None:
            mode = self.speech_encoder if self.encode_hubert else "raw"
            if mode == "conv":
                hubert = HubertConvEncoder(
                    self.hubert_latent_dim, dtype=compute, name="hubert_encoder"
                )(hubert.astype(compute), train=train)
            elif mode == "linear":
                # wav2vec2 path (transformer.py:444: Linear(768, 256))
                hubert = nn.Dense(self.hubert_latent_dim, dtype=compute,
                                  name="hubert_encoder")(
                    hubert.astype(compute))
            cond_parts.append(hubert)
        if word is not None:
            # text hook (transformer.py:519-521, completed — see config)
            w = nn.Embed(self.word_vocab, self.word_f, dtype=compute,
                         name="text_embed")(jnp.maximum(word, 0))
            w = nn.Conv(self.word_f, (3,), padding="SAME", dtype=compute,
                        name="text_tcn")(w)
            cond_parts.append(w)
        if emo is not None:
            # emotion hook (transformer.py:523-527: embedding + conv tail)
            e = nn.Embed(self.num_emotions, self.emotion_f, dtype=compute,
                         name="emotion_embed")(jnp.maximum(emo, 0))
            e = nn.Conv(self.emotion_f, (3,), padding="SAME", dtype=compute,
                        name="emotion_tail")(e)
            cond_parts.append(e)
        if exp_cond is not None:
            cond_parts.append(exp_cond.astype(compute))

        # --- classifier-free guidance batch handling --------------------
        # (encoder mode only — the decoder path has no condition concat to
        # substitute, matching the reference's encoder-guarded branches
        # at transformer.py:306-332)
        null_cond_mask = None
        if self.classifier_free and train:
            # Deterministic first-fraction rule (transformer.py:328).
            null_cond_mask = jnp.linspace(0.0, 1.0, B) < self.null_cond_prob
        do_cfg = cfg_inference and self.classifier_free and self.cond_scale != 1.0
        if do_cfg:
            x = jnp.concatenate([x, x], axis=0)
            t = jnp.concatenate([t, t], axis=0)
            audio = jnp.concatenate([audio, audio], axis=0) \
                if cache is None else audio
            person_id = jnp.concatenate([person_id, person_id], axis=0)
            src_mask = jnp.concatenate([src_mask, src_mask], axis=0)
            cond_parts = [jnp.concatenate([c, c], axis=0) for c in cond_parts]
            # First half unconditional (transformer.py:331: linspace(0,1,2B)<0.5).
            null_cond_mask = jnp.linspace(0.0, 1.0, 2 * B) < 0.5

        has_hubert = hubert is not None or (
            cache is not None and cache.hubert_lat is not None)
        null_cond_emb = None
        if self.classifier_free:
            exp_cond_dim = 0 if exp_cond is None else exp_cond.shape[-1]
            null_cond_emb = self.param(
                "null_cond_emb",
                nn.initializers.normal(1.0),
                (1, self.pre_proj_dim(has_hubert, exp_cond_dim,
                                      word is not None, emo is not None)),
            )

        # --- embeddings --------------------------------------------------
        if cache is not None:
            emb = None  # all stylization mods come precomputed
        else:
            emb = TimeEmbedMLP(self.time_embed_dim, dtype=compute,
                               name="time_embed")(
                timestep_embedding(t, self.latent_dim).astype(compute)
            )
            if self.use_pid_embed:
                emb = emb + TimeEmbedMLP(
                    self.time_embed_dim, dtype=compute, name="pid_embed"
                )(person_id.astype(compute))

        h = nn.Dense(self.latent_dim, dtype=compute, name="joint_embed")(
            x.astype(compute)
        )
        if self.pe_type == "learnable":
            pe = self.param(
                "sequence_embedding",
                nn.initializers.normal(1.0),
                (self.max_frames, self.latent_dim),
            )
            h = h + pe[None, :T, :].astype(compute)
        else:
            table = positional_encoding(
                self.pe_type, T, self.latent_dim, self.max_seq_len
            )
            h = h + jnp.asarray(table, dtype=compute)[None]
            if self.pe_type == "ppe_sinu_dropout":
                # the reference PPE's own Dropout defaults to p=0.1
                # regardless of the model dropout arg (transformer.py:20-22,
                # applied with dropout=True at :573-574)
                h = nn.Dropout(0.1)(h, deterministic=not train)

        if cache is not None:
            audio_lat, mods = cache.audio_lat, cache.mods
            if do_cfg:
                audio_lat = jnp.concatenate([audio_lat, audio_lat], axis=0)
                mods = jnp.concatenate([mods, mods], axis=2)  # batch axis
        else:
            audio_lat = nn.Dense(self.aud_latent_dim, dtype=compute,
                                 name="audio_proj")(audio.astype(compute))
            mods = None
        cond = jnp.concatenate([audio_lat] + cond_parts, axis=-1)

        # --- transformer stack -------------------------------------------
        # remat: recompute each layer's activations in the backward pass
        # instead of storing them — the standard JAX memory/FLOPs trade that
        # makes the reference's global batch (2500) fit one chip's HBM
        # (PERF.md training ladder).  static_argnums counts self at 0, so
        # ``train`` (a python bool) is argnum 7.
        if self.scan_layers:
            body_kw = dict(latent_dim=self.latent_dim, ffn_dim=self.ff_size,
                           num_heads=self.num_heads, dtype=compute,
                           dropout=self.dropout, model_base=self.model_base,
                           remat=self.remat and train)
            scan_kw = dict(variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True})
            if mods is None:
                scanned = nn.scan(_ScanLayerNoMod, in_axes=nn.broadcast,
                                  length=self.num_layers, **scan_kw)(
                    **body_kw, name="layers")
                h, _ = scanned(h, cond, emb, src_mask, null_cond_mask,
                               null_cond_emb, train)
            else:
                # the level cache already stacks mods on a leading layer
                # axis — exactly the scan's xs layout
                scanned = nn.scan(
                    _ScanLayerMod,
                    in_axes=(0,) + (nn.broadcast,) * 6,
                    length=self.num_layers, **scan_kw)(
                    **body_kw, name="layers")
                h, _ = scanned(h, mods, cond, emb, src_mask,
                               null_cond_mask, null_cond_emb, train)
        else:
            layer_cls = DiffusionTransformerLayer
            if self.remat and train:
                layer_cls = nn.remat(DiffusionTransformerLayer,
                                     static_argnums=(7,))
            for i in range(self.num_layers):
                h = layer_cls(
                    self.latent_dim,
                    self.ff_size,
                    self.num_heads,
                    dtype=compute,
                    dropout=self.dropout,
                    model_base=self.model_base,
                    name=f"layer_{i}",
                )(h, cond, emb, src_mask, null_cond_mask, null_cond_emb,
                  train, None if mods is None else mods[i])

        out_feats = self.input_feats * (2 if self.learned_variance else 1)
        out = nn.Dense(out_feats, dtype=compute, name="out")(h)
        out = out.astype(jnp.float32)

        if do_cfg:
            uncond, cond_out = out[:B], out[B:]
            if self.learned_variance:
                # guidance applies to the mean half only; the variance
                # interpolant comes from the conditional pass (guided-diffusion
                # convention — the reference transformer has no variance head)
                F = self.input_feats
                mean = uncond[..., :F] + self.cond_scale * (
                    cond_out[..., :F] - uncond[..., :F])
                out = jnp.concatenate([mean, cond_out[..., F:]], axis=-1)
            else:
                out = uncond + self.cond_scale * (cond_out - uncond)
        return out
