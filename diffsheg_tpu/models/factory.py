"""Model factory: joint UniDiffuser or single-branch ablation models.

The reference builds either the joint UniDiffuser or a standalone
MotionTransformer depending on the ablation flags (reference
runner.py:32-58 with --expression_only / --gesture_only /
--expCondition_gesture_only and the per-dataset dim rewiring at
runner.py:134-145).  Here the same surface is
``ModelConfig.branch_mode``:

  - 'joint'                  both branches + x0 bridge (the shipped model)
  - 'expression_only'        face channels only
  - 'gesture_only'           pose channels only
  - 'exp_condition_gesture'  pose channels conditioned on ground-truth
                             expression supplied by the data pipeline
                             (the reference's expCondition_gesture_only='gt')

Every model exposes the same call signature, so the train step and the
samplers are mode-agnostic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffsheg_tpu.config import ModelConfig
from diffsheg_tpu.models.denoiser import MotionDenoiser
from diffsheg_tpu.models.unidiffuser import UniDiffuser


def denoised_channels(cfg: ModelConfig) -> int:
    """Channel count the active model denoises (runner.py:134-145)."""
    mode = getattr(cfg, "branch_mode", "joint")
    if mode == "expression_only":
        return cfg.expression_dim
    if mode in ("gesture_only", "exp_condition_gesture"):
        return cfg.pose_dim
    return cfg.motion_dim


class SingleBranchDenoiser(nn.Module):
    """Standalone MotionTransformer equivalent (reference
    models/transformer.py:349-587 built directly by runner.py:47-57): one
    branch, mel conditioning projected straight to the audio latent (no
    audio-encoder layer, audio width = n_mels not 2*n_mels)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        sqrt_alphas: Tuple[jax.Array, jax.Array],  # unused (no x0 bridge)
        audio_mel: jax.Array,
        person_id: jax.Array,
        hubert: Optional[jax.Array] = None,
        exp_cond: Optional[jax.Array] = None,
        word: Optional[jax.Array] = None,
        emo: Optional[jax.Array] = None,
        train: bool = False,
        cfg_inference: bool = False,
    ) -> jax.Array:
        c = self.cfg
        mode = c.branch_mode
        if mode == "exp_condition_gesture" and exp_cond is None:
            raise ValueError("exp_condition_gesture needs exp_cond input")
        use_pid = not (c.expr_id_off and mode == "expression_only")
        branch = MotionDenoiser(
            input_feats=denoised_channels(c),
            audio_dim=c.audio_dim,
            aud_latent_dim=c.aud_latent_dim,
            latent_dim=c.latent_dim,
            ff_size=c.ff_size,
            num_layers=c.num_layers,
            num_heads=c.num_heads,
            style_dim=c.style_dim,
            pe_type=c.pe_type,
            max_seq_len=c.max_seq_len,
            use_pid_embed=use_pid,
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
            dtype=jnp.dtype(c.compute_dtype),
            name="encoder",
        )
        return branch(
            x.astype(jnp.dtype(c.compute_dtype)), t, audio_mel, person_id,
            hubert=hubert,
            exp_cond=exp_cond if mode == "exp_condition_gesture" else None,
            word=word if c.add_text_cond else None,
            emo=emo if c.add_emo_cond else None,
            train=train, cfg_inference=cfg_inference,
        )


def ablate_inputs(cfg: ModelConfig, mel: jax.Array, pid: jax.Array):
    """Input-level ablations (reference --remove_audio / --remove_style
    zero the respective conditioning; --use_single_style forces speaker 0,
    ddpm_beat_trainer.py:137-139)."""
    if cfg.remove_audio and mel is not None:
        mel = jnp.zeros_like(mel)
    if pid is not None:
        if cfg.use_single_style:
            pid = jnp.zeros_like(pid).at[..., 0].set(1.0)
        if cfg.remove_style or cfg.no_style:
            pid = jnp.zeros_like(pid)
    return mel, pid


def build_denoiser(cfg: ModelConfig) -> nn.Module:
    if getattr(cfg, "branch_mode", "joint") == "joint":
        return UniDiffuser(cfg)
    return SingleBranchDenoiser(cfg)


def host_init(init_fn, *args, **kw):
    """Run a flax ``init`` on the host CPU backend and return numpy params.

    Eager flax init EXECUTES the model forward op-by-op; on a
    remote-attached accelerator that is one network round-trip per op
    (~35 ms x thousands of ops = 10+ minutes for the 155M UniDiffuser,
    measured), and ``jax.jit(init)`` instead pays a full-model XLA compile
    for a program used exactly once.  Params need neither: threefry RNG is
    backend-deterministic, so CPU init produces bit-identical trees, and
    numpy leaves upload in bulk wherever they are first used.
    """
    import numpy as np

    cpu = jax.local_devices(backend="cpu")[0]
    to_cpu = lambda a: (jax.device_put(a, cpu)
                        if hasattr(a, "dtype") and hasattr(a, "ndim") else a)
    args = jax.tree.map(to_cpu, args)
    kw = {k: jax.tree.map(to_cpu, v) for k, v in kw.items()}
    with jax.default_device(cpu):
        variables = init_fn(*args, **kw)
    return jax.tree.map(np.asarray, variables)


def stack_scan_layers(params, num_layers: int):
    """Unrolled parameter tree -> the ``scan_layers=True`` layout.

    Walks the tree; wherever a subtree holds ``layer_0..layer_{N-1}``
    siblings (each denoiser branch, and the audio encoder is unaffected),
    they are replaced by one ``layers/layer`` subtree whose leaves gain a
    leading layer axis.  Use on existing checkpoints when enabling
    ``model.scan_layers``; :func:`unstack_scan_layers` is the inverse
    (needed to export a scan-trained checkpoint to the reference layout).
    """
    out = {}
    for k, v in params.items():
        out[k] = (stack_scan_layers(v, num_layers)
                  if isinstance(v, dict) else v)
    if "layer_0" in out:
        per = [out.pop(f"layer_{i}") for i in range(num_layers)]
        out["layers"] = {"layer": jax.tree.map(
            lambda *xs: jnp.stack(xs), *per)}
    return out


def unstack_scan_layers(params, num_layers: int):
    """Inverse of :func:`stack_scan_layers`."""
    out = {}
    for k, v in params.items():
        out[k] = (unstack_scan_layers(v, num_layers)
                  if isinstance(v, dict) else v)
    if "layers" in out and isinstance(out["layers"], dict) \
            and set(out["layers"].keys()) == {"layer"}:
        stacked = out.pop("layers")["layer"]
        for i in range(num_layers):
            out[f"layer_{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)
    return out


def init_denoiser(cfg: ModelConfig, n_poses: int, rng: jax.Array,
                  batch: int = 1):
    """Initialise (model, variables) for any branch mode."""
    model = build_denoiser(cfg)
    C = denoised_channels(cfg)
    x = jnp.zeros((batch, n_poses, C))
    t = jnp.zeros((batch,), dtype=jnp.int32)
    sa = (jnp.ones((batch, 1, 1)), jnp.ones((batch, 1, 1)))
    mel = jnp.zeros((batch, n_poses, cfg.audio_dim))
    pid = jnp.zeros((batch, cfg.style_dim))
    hub = (jnp.zeros((batch, n_poses, cfg.hubert_dim))
           if cfg.add_hubert else None)
    kw = {}
    if cfg.branch_mode == "exp_condition_gesture":
        kw["exp_cond"] = jnp.zeros((batch, n_poses, cfg.expression_dim))
    if cfg.add_text_cond:
        kw["word"] = jnp.zeros((batch, n_poses), dtype=jnp.int32)
    if cfg.add_emo_cond:
        kw["emo"] = jnp.zeros((batch, n_poses), dtype=jnp.int32)
    variables = host_init(model.init, rng, x, t, sa, mel, pid, hubert=hub,
                          train=False, **kw)
    return model, variables
