"""Typed configuration for diffsheg_tpu.

The reference drives everything through ~90 argparse flags plus per-dataset
constants injected in code (reference: options/base_options.py:13-148 and
runner.py:124-225).  Here the same behavioural surface is expressed as frozen
dataclasses with two presets (``beat_config``, ``show_config``) reproducing the
shipped experiment configurations.

All fields that alter traced computation are static Python values, so a config
hash keys the jit cache naturally.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field



@dataclass(frozen=True)
class ModelConfig:
    """Denoiser (UniDiffuser) architecture.

    Mirrors reference models/transformer.py:349-770 defaults as instantiated by
    runner.py:32-58 (latent 512, 8 layers, 8 heads, ffn 1024, mel 128 -> audio
    latent 256, HuBERT 1024 -> 128 conv encoder).
    """

    pose_dim: int = 141          # gesture channels (BEAT axis-angle 47 joints x 3)
    expression_dim: int = 51     # face channels (ARKit-style blendshapes)
    latent_dim: int = 512
    num_layers: int = 8
    num_heads: int = 8
    ff_size: int = 1024
    audio_dim: int = 128         # mel bins
    aud_latent_dim: int = 256
    style_dim: int = 30          # number of speakers (one-hot)
    max_seq_len: int = 600       # sinusoidal PE table period (pe_sinu)
    pe_type: str = "pe_sinu"     # {'learnable','ppe_sinu','pe_sinu','pe_sinu_repeat'}
    dropout: float = 0.0
    # conditioning wiring (reference flags --cond_projection/--cond_residual,
    # --addHubert/--encode_hubert; defaults per base_options.py:21-22,95,98)
    cond_projection: str = "mlp_includeX"
    cond_residual: bool = True
    add_hubert: bool = True
    encode_hubert: bool = True
    hubert_dim: int = 1024
    hubert_latent_dim: int = 128
    # speech-feature encoder inside the denoiser (transformer.py:436-444):
    # 'conv' = Conv+BN+GELU+Conv 1024->128 (hubert, --encode_hubert);
    # 'linear' = Dense hubert_dim->hubert_latent_dim (--encode_wav2vec2,
    #            set hubert_dim=768, hubert_latent_dim=256 for wav2vec2);
    # 'raw' = concatenate features unencoded
    speech_encoder: str = "conv"
    # text / emotion conditioning hooks (--addTextCond/--addEmoCond,
    # base_options.py:92-93).  NOTE: the reference *declares* these
    # (transformer.py:519-527 uses self.text_encoder/self.emotion_embedding
    # and budgets word_f/emotion_f dims at :409-412) but never constructs
    # the modules, so the flags crash upstream; here they are completed per
    # the layer-dim contract: per-frame int labels -> Embed (+ temporal conv
    # tail for emotion) -> concatenated into the per-layer condition.
    add_text_cond: bool = False
    add_emo_cond: bool = False
    word_f: int = 128            # text-condition width
    emotion_f: int = 8           # emotion-condition width
    word_vocab: int = 2048       # text vocabulary size
    num_emotions: int = 8        # BEAT's emotion-category count
    # classifier-free guidance (base_options.py:106-108)
    classifier_free: bool = False
    null_cond_prob: float = 0.2
    cond_scale: float = 1.0
    # ablation switches honoured for parity
    # branch_mode selects the built model (reference runner.py:32-58 +
    # --expression_only/--gesture_only/--expCondition_gesture_only):
    # {'joint','expression_only','gesture_only','exp_condition_gesture'}
    branch_mode: str = "joint"
    expr_id_off: bool = False    # --ExprID_off: expression branch has no speaker embed
    no_style: bool = False       # --remove_style semantics are handled at input level
    remove_audio: bool = False   # --remove_audio: zero the mel conditioning
    remove_style: bool = False   # --remove_style: zero the speaker one-hot
    use_single_style: bool = False  # --use_single_style: force every sample's
                                 # one-hot to speaker 0 (base_options.py:116,
                                 # ddpm_beat_trainer.py:137-139)
    # model_base (--model_base, base_options.py:20): 'transformer_encoder'
    # (shipped default, per-layer condition concat+projection) or
    # 'transformer_decoder' (per-layer linear cross-attention over the audio
    # latent instead — reference transformer.py:294-296,344-346,133-166)
    model_base: str = "transformer_encoder"
    # 2x-channel output head for ModelVarType.LEARNED/LEARNED_RANGE sampling
    # and the hybrid VLB loss (gaussian_diffusion.py:549-566,1363-1374)
    learned_variance: bool = False
    # per-layer activation remat in training (jax.checkpoint / nn.remat):
    # trades backward-pass recompute FLOPs for HBM, fitting the reference's
    # global batch 2500 on one chip (PERF.md training ladder)
    remat: bool = False
    # run each branch's transformer stack as ONE lax.scan over
    # layer-stacked params: identical math (tests pin it), ~num_layers x
    # smaller HLO and far faster XLA compiles.  Changes the parameter
    # layout — convert existing checkpoints with
    # models.factory.{stack,unstack}_scan_layers
    scan_layers: bool = False
    compute_dtype: str = "float32"  # dtype for matmuls inside the denoiser

    @property
    def motion_dim(self) -> int:
        """Total denoised channel count (gesture ++ expression)."""
        return self.pose_dim + self.expression_dim

    @property
    def time_embed_dim(self) -> int:
        return self.latent_dim * 4

    @property
    def uses_cfg_at_inference(self) -> bool:
        return self.classifier_free and self.cond_scale != 1.0


@dataclass(frozen=True)
class DiffusionConfig:
    """Forward/reverse process (reference models/gaussian_diffusion.py:234-278,
    trainers/ddpm_beat_trainer.py:55-86)."""

    num_steps: int = 1000
    beta_schedule: str = "linear"        # {'linear','cosine'}
    mean_type: str = "epsilon"           # {'epsilon','start_x','previous_x'}
    var_type: str = "fixed_small"        # {'fixed_small','fixed_large',
                                         #  'learned','learned_range'};
                                         # learned* require
                                         # model.learned_variance=True
    respacing: str = "ddim25"            # '' = no respacing; 'ddimN' or 'a,b,c'
    sampler: str = "ddim"                # {'ddim','ancestral'}: the reverse-
                                         # process family the serving windows
                                         # run — DDIM (reference
                                         # ddim_sample_loop, the shipped
                                         # path) or ancestral p_sample with
                                         # the full ModelVarType surface and
                                         # before-model inpaint projection
                                         # (gaussian_diffusion.py:684-920)
    clip_denoised: bool = False          # clamp x0 predictions to [-1,1]
                                         # (reference samples with False,
                                         # ddpm_beat_trainer.py:194)
    # RePaint resampling knobs (base_options.py:127-128)
    jump_length: int = 3
    jump_n_sample: int = 5
    no_resample: bool = False
    scan_unroll: int = 1   # lax.scan unroll factor for the sampler loop
                           # (>1 trades compile time for fewer loop-carried
                           # dispatch boundaries)
    fused_step: str = "auto"   # streamlined post-model DDIM+RePaint step
                               # math (ops/step_math.py): scalars hoisted
                               # out of the scan + algebraic eps identity.
                               # 'auto' = jnp composition on TPU; 'jnp'
                               # force; 'on' = per-step Pallas kernel
                               # (measured slower end-to-end — kept for
                               # experiments); 'off' = general path
    fused_layer: str = "auto"  # whole-layer Pallas kernel in the sampler
                               # ('auto' = on for TPU backends when the
                               # level cache applies; 'on' forces it —
                               # interpret mode off-TPU; 'off' disables;
                               # 'chain' = whole-branch grid-pipelined
                               # kernel, opt-in: slightly faster steady
                               # state, much slower compile).
                               # See ops/fused_layer.py.
    level_cache: bool = True  # precompute all x-independent conditioning
                              # (time/pid embeddings, audio encoder,
                              # stylization modulations) once per window for
                              # every timestep level instead of once per
                              # denoise step — ~60% less HBM weight traffic
                              # in the sampler scan (models/level_cache.py);
                              # numerically identical, sampling-only
    quantize: str = "none"    # {'none','int8','int4'}: weight-only per-
                              # output-channel quantization for the fused
                              # serving path's transformer stack
                              # (ops/fused_layer.py LayerScales) — int8
                              # halves its HBM weight traffic per denoise
                              # step (4233 FPS chain, drift in PERF.md);
                              # approximate, opt-in, requires the
                              # fused_layer fast path.  int4 is
                              # EXPERIMENTAL and measured SLOW on real
                              # TPU (PERF.md "int4: a negative result")
                              # — serve int8


@dataclass(frozen=True)
class StreamConfig:
    """Arbitrary-length windowed-outpainting generation
    (reference trainers/ddpm_beat_trainer.py:1123-1346)."""

    overlap_len: int = 4
    single_dispatch: bool = True  # serve mel+HuBERT+sampler as ONE compiled
                                  # program (sampling/pipeline.py); false =
                                  # staged jits with per-stage RTF
    add_blend: bool = True        # linear cross-fade at low noise (--addBlend)
    fix_very_first: bool = False  # pin the first window's head to GT
    no_repaint: bool = False      # disable the harmonize (jump) schedule
    same_overlap_noisy: bool = False


@dataclass(frozen=True)
class DataConfig:
    """Dataset-dependent constants (reference runner.py:124-225)."""

    dataset_name: str = "beat"
    fps: int = 15
    n_poses: int = 34            # training window length (frames)
    stride: int = 10             # cache windowing stride
    audio_sr: int = 16000        # raw audio rate for HuBERT
    mel_sr: int = 18000          # mel frontend rate
    mel_hop: int = 1200          # = mel_sr / fps
    n_mels: int = 128
    speaker_dim: int = 30
    data_root: str = "data/BEAT"
    cache_name: str = "beat_4english_15_141"
    # --remove_hand (base_options.py:56): drop hand rotation channels from
    # the motion data; BEAT keeps channels [0:21]+[75:87] (33 of 141,
    # ddpm_beat_trainer.py:390), SHOW keeps the 39 body dims of the 129-d
    # gesture (runner.py:195-197; the reference trainer's :63 slice at
    # ddpm_show_trainer.py:367 contradicts its own dim_pose=39 and would
    # crash — we implement the consistent runner semantics).
    remove_hand: bool = False
    # --audio_feat (base_options.py:43): conditioning feature for SHOW.
    # {'mel','mfcc','raw'} are data-layer choices; 'hubert'/'wav2vec2' are
    # expressed through model.add_hubert/speech_encoder instead.
    audio_feat: str = "mel"
    n_mfcc: int = 64             # mfcc dims (runner.py:210-211 audio_dim 64)


@dataclass(frozen=True)
class TrainConfig:
    """Optimisation settings (reference ddpm_beat_trainer.py:126-128,222-260,343)."""

    batch_size: int = 2500       # global batch, sharded over the data mesh axis
    num_epochs: int = 1000
    lr: float = 2e-4
    grad_clip: float = 0.5
    # loss weights. NOTE: the reference *logs* 100*vel but adds the
    # unweighted velocity term to the objective (ddpm_beat_trainer.py:245-247)
    # while x0 gets the full 100x (:255-257); we match the actual objective.
    eps_weight: float = 1000.0
    vel_weight: float = 1.0
    x0_weight: float = 100.0
    huber_beta: float = 0.1      # smooth-L1 transition (loss_factory.py:19-27)
    # diffusion loss family (reference LossType, gaussian_diffusion.py:293-308
    # + training_losses :1342-1374): 'mse' / 'rescaled_mse' add a VLB term for
    # the variance head when model.learned_variance (rescaled_mse scales it by
    # num_steps/1000); 'kl' / 'rescaled_kl' train on the VLB alone.
    loss_type: str = "mse"
    vel_loss_start: int = -1     # epoch gate for velocity/x0 terms
    use_sem_weighting: bool = True  # BEAT: scale huber(x0) by (semantic score + 1)
    log_every: int = 50
    save_every_epochs: int = 20
    eval_every_epochs: int = 40
    seed: int = 0
    checkpoints_dir: str = "checkpoints"
    timestep_sampler: str = "uniform"  # {uniform, loss-second-moment}
    on_device_frontend: bool = False  # compute mel + HuBERT INSIDE the
                                 # jitted train step from the cache's raw
                                 # 16 kHz window audio (audio/frontend.py)
                                 # instead of shipping precomputed features
                                 # host->device (~1.9x fewer bytes/batch —
                                 # 187->101 MB at batch 1024; the
                                 # reference extracts HuBERT on the host,
                                 # ddpm_beat_trainer.py:1429-1475)
    debug_nans: bool = False     # NaN tripwire (the reference enables
                                 # torch.autograd.set_detect_anomaly
                                 # unconditionally, runner.py:112; here it
                                 # is opt-in because jax_debug_nans disables
                                 # async dispatch)
    debug: bool = False          # --debug: truncate every loop to one
                                 # iteration (reference base_options.py:33)
    reset_lr: bool = False       # --reset_lr: after resuming a checkpoint,
                                 # force the optimizer lr back to train.lr
                                 # (train_options.py:15,
                                 # ddpm_beat_trainer.py:352-354)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. The model is small (~50-100M params) so data
    parallelism over ICI is the production layout; the fsdp axis exists for
    memory-constrained scaling experiments."""

    data_axis: str = "data"
    fsdp_axis: str = "fsdp"
    data_parallel: int = -1      # -1 = all devices
    fsdp_parallel: int = 1


@dataclass(frozen=True)
class Config:
    """Top-level experiment config."""

    name: str = "beat_diffsheg_tpu"
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    stream: StreamConfig = field(default_factory=StreamConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "Config":
        raw = json.loads(text)
        return Config(
            name=raw.get("name", "unnamed"),
            model=ModelConfig(**raw.get("model", {})),
            diffusion=DiffusionConfig(**raw.get("diffusion", {})),
            stream=StreamConfig(**raw.get("stream", {})),
            data=DataConfig(**raw.get("data", {})),
            train=TrainConfig(**raw.get("train", {})),
            mesh=MeshConfig(**raw.get("mesh", {})),
        )


def check_variance_coupling(cfg: Config) -> None:
    """A learned-variance head and a learned var_type come as a pair: the
    sampler/loss split the 2C output iff ``var_type`` is learned*, and the
    model emits 2C channels iff ``model.learned_variance`` (the reference
    couples them through ModelVarType at gaussian_diffusion.py:549-566).
    Raise early with guidance instead of a trace-time shape error."""
    learned = cfg.diffusion.var_type in ("learned", "learned_range")
    if cfg.model.learned_variance and not learned:
        raise ValueError(
            "model.learned_variance=True needs diffusion.var_type="
            "'learned' or 'learned_range' (got "
            f"{cfg.diffusion.var_type!r}) — the 2C output must be split")
    if learned and not cfg.model.learned_variance:
        raise ValueError(
            f"diffusion.var_type={cfg.diffusion.var_type!r} needs "
            "model.learned_variance=True — the model must emit a variance "
            "head")


def resolve(cfg: Config) -> Config:
    """Apply the cross-field constants the reference injects in code.

    Mirrors runner.py's per-dataset dim rewrites: --remove_hand shrinks
    dim_pose (runner.py:128-131 BEAT 141->33, :193-197 SHOW 129->39) and
    --audio_feat selects audio_dim (runner.py:210-217: mfcc 64, mel 128,
    raw 1).  Only rewrites dims still at their full-preset defaults, so
    explicit ``--set model.pose_dim=...`` overrides win.
    """
    check_variance_coupling(cfg)
    model = cfg.model
    if cfg.data.remove_hand:
        is_beat = cfg.data.dataset_name == "beat"
        full = 141 if is_beat else 129
        no_hand = 33 if is_beat else 39
        if model.pose_dim == full:
            model = dataclasses.replace(model, pose_dim=no_hand)
    # --audio_feat selects the SHOW conditioning width (runner.py:210-217
    # lives in the SHOW branch; the BEAT pipeline always emits mel).  Only
    # rewrite when audio_dim is still at its preset default, so an
    # explicit --set model.audio_dim=... wins.
    feat_dim = {"mel": cfg.data.n_mels, "mfcc": cfg.data.n_mfcc,
                "raw": 1}.get(cfg.data.audio_feat)
    if (feat_dim is not None and cfg.data.dataset_name != "beat"
            and model.audio_dim == 128 and model.audio_dim != feat_dim):
        model = dataclasses.replace(model, audio_dim=feat_dim)
    return cfg.replace(model=model) if model is not cfg.model else cfg


def beat_config(**overrides) -> Config:
    """BEAT preset: 141-d gesture + 51-d face @ 15 fps, 34-frame windows
    (reference runner.py:124-187, train_test_scripts.sh:4-15)."""
    cfg = Config(
        name="beat_diffsheg_tpu",
        model=ModelConfig(
            pose_dim=141, expression_dim=51, style_dim=30,
        ),
        data=DataConfig(
            dataset_name="beat", fps=15, n_poses=34, stride=10,
            speaker_dim=30, mel_sr=18000, mel_hop=1200,
        ),
        stream=StreamConfig(overlap_len=4),
        train=TrainConfig(batch_size=2500, num_epochs=1000),
    )
    return cfg.replace(**overrides) if overrides else cfg


def show_config(**overrides) -> Config:
    """SHOW/TalkSHOW preset: 129-d SMPL-X pose + 103-d jaw/expression @ 30 fps,
    88-frame windows, classifier-free guidance (reference runner.py:189-222,
    inference_custom_audio_show.sh)."""
    cfg = Config(
        name="talkshow_diffsheg_tpu",
        model=ModelConfig(
            pose_dim=129, expression_dim=103, style_dim=4,
            classifier_free=True, cond_scale=1.15,
        ),
        data=DataConfig(
            dataset_name="talkshow", fps=30, n_poses=88, stride=10,
            speaker_dim=4, mel_sr=18000, mel_hop=600,
            data_root="data/SHOW", cache_name="talkshow_cache",
        ),
        stream=StreamConfig(overlap_len=10),
        train=TrainConfig(batch_size=950, num_epochs=4000, use_sem_weighting=False),
    )
    return cfg.replace(**overrides) if overrides else cfg
