"""Reference (torch) checkpoint conversion.

The reference saves ``{'encoder': state_dict, 'opt_encoder': ..., 'ep': ...}``
tar files (trainers/ddpm_beat_trainer.py:282-298).  This module maps that
state dict onto the Flax variable tree of :class:`UniDiffuser` so published
DiffSHEG checkpoints run unchanged on TPU.

Key mapping (reference models/transformer.py module names -> ours):

  time_embed.{0,2}                         -> time_embed.{fc1,fc2}
  encoder_aud.sa_block.*                   -> encoder_aud.sa_block.*
  encoder_{exp,ges}.joint_embed            -> same
  encoder_{exp,ges}.audio_proj             -> same
  encoder_{exp,ges}.hubert_encoder.{0,1,3} -> hubert_encoder.{conv1,bn,conv2}
  encoder_{exp,ges}.time_embed.{0,2}       -> time_embed.{fc1,fc2}
  encoder_{exp,ges}.pid_embed.{0,2}        -> pid_embed.{fc1,fc2}
  ...temporal_decoder_blocks.N.feat_proj.{0,1,3} -> layer_N.feat_proj.{norm,fc1,fc2}
  ...sa_block.proj_out.emb_layers.1        -> sa_block.proj_out.emb_proj
  ...sa_block.proj_out.out_layers.2        -> sa_block.proj_out.out_proj
  ...ffn.{linear1,linear2}                 -> same
  out                                      -> out
  null_cond_emb                            -> null_cond_emb

Tensor layout transforms: torch Linear (out,in) -> Flax kernel (in,out);
torch Conv1d (out, in/groups, k) -> Flax (k, in/groups, out); BatchNorm
weight/bias -> scale/bias with running stats into the batch_stats collection.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from diffsheg_tpu.config import ModelConfig


def _t(x) -> np.ndarray:
    """torch tensor / array -> numpy float32."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    return {"kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"])}


def _linear_nobias(sd, prefix) -> Dict[str, np.ndarray]:
    return {"kernel": _t(sd[f"{prefix}.weight"]).T}


def _layernorm(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _conv1d(sd, prefix, bias=True) -> Dict[str, np.ndarray]:
    w = _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)  # (k, in, out)
    out = {"kernel": w}
    if bias:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _stylization(sd, prefix) -> Dict[str, Any]:
    return {
        "emb_proj": _linear(sd, f"{prefix}.emb_layers.1"),
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "out_proj": _linear(sd, f"{prefix}.out_layers.2"),
    }


def _sa_block(sd, prefix) -> Dict[str, Any]:
    return {
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "query": _linear(sd, f"{prefix}.query"),
        "key": _linear(sd, f"{prefix}.key"),
        "value": _linear(sd, f"{prefix}.value"),
        "proj_out": _stylization(sd, f"{prefix}.proj_out"),
    }


def _ffn(sd, prefix) -> Dict[str, Any]:
    return {
        "linear1": _linear(sd, f"{prefix}.linear1"),
        "linear2": _linear(sd, f"{prefix}.linear2"),
        "proj_out": _stylization(sd, f"{prefix}.proj_out"),
    }


def _time_mlp(sd, prefix) -> Dict[str, Any]:
    return {"fc1": _linear(sd, f"{prefix}.0"), "fc2": _linear(sd, f"{prefix}.2")}


def _layer(sd, prefix) -> Dict[str, Any]:
    out = {
        "sa_block": _sa_block(sd, f"{prefix}.sa_block"),
        "ffn": _ffn(sd, f"{prefix}.ffn"),
    }
    if f"{prefix}.ca_block.norm.weight" in sd:
        # transformer_decoder mode: LinearTemporalCrossAttention
        # (reference models/transformer.py:133-166,294-296)
        out["ca_block"] = {
            "norm": _layernorm(sd, f"{prefix}.ca_block.norm"),
            "text_norm": _layernorm(sd, f"{prefix}.ca_block.text_norm"),
            "query": _linear(sd, f"{prefix}.ca_block.query"),
            "key": _linear(sd, f"{prefix}.ca_block.key"),
            "value": _linear(sd, f"{prefix}.ca_block.value"),
            "proj_out": _stylization(sd, f"{prefix}.ca_block.proj_out"),
        }
    if f"{prefix}.feat_proj.0.weight" in sd:  # mlp projection (LN,Lin,SiLU,Lin)
        out["feat_proj"] = {
            "norm": _layernorm(sd, f"{prefix}.feat_proj.0"),
            "fc1": _linear(sd, f"{prefix}.feat_proj.1"),
            "fc2": _linear(sd, f"{prefix}.feat_proj.3"),
        }
    elif f"{prefix}.feat_proj.weight" in sd:  # linear projection variant
        out["feat_proj"] = _linear(sd, f"{prefix}.feat_proj")
    return out


def _branch(sd, prefix, cfg: ModelConfig, num_layers: int
            ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, batch_stats) for one MotionTransformer branch."""
    params: Dict[str, Any] = {
        "joint_embed": _linear(sd, f"{prefix}.joint_embed"),
        "audio_proj": _linear(sd, f"{prefix}.audio_proj"),
        "time_embed": _time_mlp(sd, f"{prefix}.time_embed"),
        "out": _linear(sd, f"{prefix}.out"),
    }
    stats: Dict[str, Any] = {}
    if f"{prefix}.pid_embed.0.weight" in sd:
        params["pid_embed"] = _time_mlp(sd, f"{prefix}.pid_embed")
    if f"{prefix}.hubert_encoder.0.weight" in sd:
        params["hubert_encoder"] = {
            "conv1": _conv1d(sd, f"{prefix}.hubert_encoder.0", bias=False),
            "conv2": _conv1d(sd, f"{prefix}.hubert_encoder.3", bias=False),
            "bn": {"scale": _t(sd[f"{prefix}.hubert_encoder.1.weight"]),
                   "bias": _t(sd[f"{prefix}.hubert_encoder.1.bias"])},
        }
        stats["hubert_encoder"] = {
            "bn": {"mean": _t(sd[f"{prefix}.hubert_encoder.1.running_mean"]),
                   "var": _t(sd[f"{prefix}.hubert_encoder.1.running_var"])},
        }
    elif f"{prefix}.hubert_encoder.weight" in sd:
        # wav2vec2 path: a single nn.Linear(768, 256)
        # (reference models/transformer.py:444, encode_wav2vec2)
        params["hubert_encoder"] = _linear(sd, f"{prefix}.hubert_encoder")
    if f"{prefix}.null_cond_emb" in sd:
        params["null_cond_emb"] = _t(sd[f"{prefix}.null_cond_emb"])
    if f"{prefix}.sequence_embedding" in sd:
        params["sequence_embedding"] = _t(sd[f"{prefix}.sequence_embedding"])
    for i in range(num_layers):
        params[f"layer_{i}"] = _layer(sd, f"{prefix}.temporal_decoder_blocks.{i}")
    return params, stats


def convert_unidiffuser_state_dict(
    sd: Dict[str, Any], cfg: ModelConfig, num_layers: int = None
) -> Dict[str, Any]:
    """Reference UniDiffuser state_dict -> Flax variables {'params', 'batch_stats'}."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}
    num_layers = num_layers or cfg.num_layers

    params: Dict[str, Any] = {"time_embed": _time_mlp(sd, "time_embed")}
    params["encoder_aud"] = _layer(sd, "encoder_aud")
    stats: Dict[str, Any] = {}

    for name in ("encoder_exp", "encoder_ges"):
        p, s = _branch(sd, name, cfg, num_layers)
        params[name] = p
        if s:
            stats[name] = s

    return {"params": _to_jnp(params), "batch_stats": _to_jnp(stats)}


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def load_reference_checkpoint(path: str, cfg: ModelConfig) -> Dict[str, Any]:
    """Load a reference ``.tar`` checkpoint file (requires torch on host)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["encoder"] if "encoder" in ckpt else ckpt
    return convert_unidiffuser_state_dict(sd, cfg)


# --------------------------------------------------------------------------
# reverse direction: Flax variables -> reference state_dict / .tar
# --------------------------------------------------------------------------
#
# Lets models trained HERE be evaluated or fine-tuned in the reference
# torch harness (it loads {'encoder': state_dict, ...} tars with
# strict=False, trainers/ddpm_beat_trainer.py:282-318).  Each transform is
# the exact inverse of the loaders above, so convert->export->convert is
# the identity (tests/test_compat.py).

def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _inv_linear(sd, prefix, p) -> None:
    sd[f"{prefix}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _inv_layernorm(sd, prefix, p) -> None:
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])


def _inv_conv1d(sd, prefix, p) -> None:
    sd[f"{prefix}.weight"] = _np(p["kernel"]).transpose(2, 1, 0)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np(p["bias"])


def _inv_stylization(sd, prefix, p) -> None:
    _inv_linear(sd, f"{prefix}.emb_layers.1", p["emb_proj"])
    _inv_layernorm(sd, f"{prefix}.norm", p["norm"])
    _inv_linear(sd, f"{prefix}.out_layers.2", p["out_proj"])


def _inv_attention(sd, prefix, p) -> None:
    """sa_block and ca_block share the norm/q/k/v/proj_out layout; the
    cross-attention block adds text_norm."""
    _inv_layernorm(sd, f"{prefix}.norm", p["norm"])
    if "text_norm" in p:
        _inv_layernorm(sd, f"{prefix}.text_norm", p["text_norm"])
    for name in ("query", "key", "value"):
        _inv_linear(sd, f"{prefix}.{name}", p[name])
    _inv_stylization(sd, f"{prefix}.proj_out", p["proj_out"])


def _inv_ffn(sd, prefix, p) -> None:
    _inv_linear(sd, f"{prefix}.linear1", p["linear1"])
    _inv_linear(sd, f"{prefix}.linear2", p["linear2"])
    _inv_stylization(sd, f"{prefix}.proj_out", p["proj_out"])


def _inv_time_mlp(sd, prefix, p) -> None:
    _inv_linear(sd, f"{prefix}.0", p["fc1"])
    _inv_linear(sd, f"{prefix}.2", p["fc2"])


def _inv_layer(sd, prefix, p) -> None:
    _inv_attention(sd, f"{prefix}.sa_block", p["sa_block"])
    _inv_ffn(sd, f"{prefix}.ffn", p["ffn"])
    if "ca_block" in p:
        _inv_attention(sd, f"{prefix}.ca_block", p["ca_block"])
    if "feat_proj" in p:
        fp = p["feat_proj"]
        if "norm" in fp:         # mlp variant (LN, Linear, SiLU, Linear)
            _inv_layernorm(sd, f"{prefix}.feat_proj.0", fp["norm"])
            _inv_linear(sd, f"{prefix}.feat_proj.1", fp["fc1"])
            _inv_linear(sd, f"{prefix}.feat_proj.3", fp["fc2"])
        else:                    # plain linear variant
            _inv_linear(sd, f"{prefix}.feat_proj", fp)


def _inv_branch(sd, prefix, params, stats) -> None:
    _inv_linear(sd, f"{prefix}.joint_embed", params["joint_embed"])
    _inv_linear(sd, f"{prefix}.audio_proj", params["audio_proj"])
    _inv_time_mlp(sd, f"{prefix}.time_embed", params["time_embed"])
    _inv_linear(sd, f"{prefix}.out", params["out"])
    if "pid_embed" in params:
        _inv_time_mlp(sd, f"{prefix}.pid_embed", params["pid_embed"])
    if "hubert_encoder" in params:
        he = params["hubert_encoder"]
        if "conv1" in he:        # encode_hubert conv stack
            _inv_conv1d(sd, f"{prefix}.hubert_encoder.0", he["conv1"])
            _inv_conv1d(sd, f"{prefix}.hubert_encoder.3", he["conv2"])
            sd[f"{prefix}.hubert_encoder.1.weight"] = _np(he["bn"]["scale"])
            sd[f"{prefix}.hubert_encoder.1.bias"] = _np(he["bn"]["bias"])
            bn_stats = (stats or {}).get("hubert_encoder", {}).get("bn", {})
            if not bn_stats:
                raise ValueError(
                    "cannot export: conv hubert_encoder has no batch_stats "
                    "(BatchNorm running mean/var -> hubert_encoder.1."
                    "running_mean/var) — a tar without them reloads under "
                    "the reference's strict=False with INIT stats (mean 0, "
                    "var 1), silently wrong; restore the checkpoint with "
                    "its batch_stats collection before exporting")
            sd[f"{prefix}.hubert_encoder.1.running_mean"] = \
                _np(bn_stats["mean"])
            sd[f"{prefix}.hubert_encoder.1.running_var"] = \
                _np(bn_stats["var"])
        else:                    # wav2vec2 single nn.Linear variant
            _inv_linear(sd, f"{prefix}.hubert_encoder", he)
    if "null_cond_emb" in params:
        sd[f"{prefix}.null_cond_emb"] = _np(params["null_cond_emb"])
    if "sequence_embedding" in params:
        sd[f"{prefix}.sequence_embedding"] = \
            _np(params["sequence_embedding"])
    i = 0
    while f"layer_{i}" in params:
        _inv_layer(sd, f"{prefix}.temporal_decoder_blocks.{i}",
                   params[f"layer_{i}"])
        i += 1


def export_unidiffuser_state_dict(variables: Dict[str, Any]
                                  ) -> Dict[str, np.ndarray]:
    """Flax UniDiffuser variables -> reference state_dict (numpy values,
    reference models/transformer.py module names).

    Raises ``ValueError`` for variable trees that have no reference
    representation instead of exporting a silently-incomplete tar."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    missing = [n for n in ("encoder_exp", "encoder_ges") if n not in params]
    if missing:
        raise ValueError(
            f"cannot export: params lack {missing} — only the two-branch "
            "UniDiffuser (model.branch_mode='joint') maps onto the "
            "reference checkpoint layout (models/transformer.py:603-700); "
            "single-branch trees have no upstream equivalent")
    unconvertible = sorted(
        f"{b}.{k}" for b in ("encoder_exp", "encoder_ges")
        for k in ("text_embed", "text_tcn", "emotion_embed", "emotion_tail")
        if k in params[b])
    if unconvertible:
        raise ValueError(
            f"cannot export: {unconvertible} have no reference layout — "
            "the upstream addTextCond/addEmoCond path references "
            "self.text_encoder/self.emotion_embedding modules it never "
            "defines (models/transformer.py:519-527), so these trained "
            "weights would be silently dropped by a strict=False load")
    sd: Dict[str, np.ndarray] = {}
    _inv_time_mlp(sd, "time_embed", params["time_embed"])
    _inv_layer(sd, "encoder_aud", params["encoder_aud"])
    for name in ("encoder_exp", "encoder_ges"):
        _inv_branch(sd, name, params[name], stats.get(name))
    return sd


def save_reference_checkpoint(variables: Dict[str, Any], path: str,
                              epoch: int = 0, total_it: int = 0) -> str:
    """Write a reference-format ``.tar`` (torch.save) checkpoint the
    upstream harness loads with its own ckpt code
    (trainers/ddpm_beat_trainer.py:282-318)."""
    import torch

    # np.array(copy=True) keeps torch off jax's read-only buffer views
    sd = {k: torch.from_numpy(np.array(v, dtype=np.float32))
          for k, v in export_unidiffuser_state_dict(variables).items()}
    torch.save({"encoder": sd, "ep": int(epoch),
                "total_it": int(total_it)}, path)
    return path


# --------------------------------------------------------------------------
# synthetic state-dict generator — used by tests to validate the mapping
# without shipping a real checkpoint
# --------------------------------------------------------------------------

def expected_reference_keys(cfg: ModelConfig, num_layers: int = None
                            ) -> Dict[str, Tuple[int, ...]]:
    """Enumerate the reference state_dict keys and shapes for a UniDiffuser
    built with ``cfg`` (derived from models/transformer.py:349-700)."""
    L = cfg.latent_dim
    E = cfg.time_embed_dim
    A = cfg.audio_dim          # 128
    AL = cfg.aud_latent_dim    # 256
    num_layers = num_layers or cfg.num_layers
    keys: Dict[str, Tuple[int, ...]] = {}

    def linear(prefix, din, dout):
        keys[f"{prefix}.weight"] = (dout, din)
        keys[f"{prefix}.bias"] = (dout,)

    def ln(prefix, d):
        keys[f"{prefix}.weight"] = (d,)
        keys[f"{prefix}.bias"] = (d,)

    def styl(prefix, d):
        linear(f"{prefix}.emb_layers.1", E, 2 * d)
        ln(f"{prefix}.norm", d)
        linear(f"{prefix}.out_layers.2", d, d)

    def sa(prefix, d):
        ln(f"{prefix}.norm", d)
        linear(f"{prefix}.query", d, d)
        linear(f"{prefix}.key", d, d)
        linear(f"{prefix}.value", d, d)
        styl(f"{prefix}.proj_out", d)

    def ffn(prefix, d):
        linear(f"{prefix}.linear1", d, cfg.ff_size)
        linear(f"{prefix}.linear2", cfg.ff_size, d)
        styl(f"{prefix}.proj_out", d)

    def layer(prefix, d, pre_proj=None):
        if pre_proj is not None:
            ln(f"{prefix}.feat_proj.0", pre_proj)
            linear(f"{prefix}.feat_proj.1", pre_proj, 2 * d)
            linear(f"{prefix}.feat_proj.3", 2 * d, d)
        sa(f"{prefix}.sa_block", d)
        ffn(f"{prefix}.ffn", d)

    # top level
    linear("time_embed.0", L, E)
    linear("time_embed.2", E, E)
    layer("encoder_aud", A, pre_proj=None)

    for name, feats, exp_cond in (("encoder_exp", cfg.expression_dim, 0),
                                  ("encoder_ges", cfg.pose_dim,
                                   cfg.expression_dim)):
        p = f"{name}"
        linear(f"{p}.joint_embed", feats, L)
        linear(f"{p}.audio_proj", 2 * A, AL)
        linear(f"{p}.time_embed.0", L, E)
        linear(f"{p}.time_embed.2", E, E)
        use_pid = not (cfg.expr_id_off and name == "encoder_exp")
        if use_pid:
            linear(f"{p}.pid_embed.0", cfg.style_dim, E)
            linear(f"{p}.pid_embed.2", E, E)
        if cfg.add_hubert and cfg.encode_hubert:
            if cfg.speech_encoder == "linear":
                # wav2vec2: one nn.Linear (transformer.py:444)
                linear(f"{p}.hubert_encoder", cfg.hubert_dim,
                       cfg.hubert_latent_dim)
            else:
                keys[f"{p}.hubert_encoder.0.weight"] = (cfg.hubert_latent_dim,
                                                        cfg.hubert_dim, 3)
                keys[f"{p}.hubert_encoder.1.weight"] = (cfg.hubert_latent_dim,)
                keys[f"{p}.hubert_encoder.1.bias"] = (cfg.hubert_latent_dim,)
                keys[f"{p}.hubert_encoder.1.running_mean"] = (
                    cfg.hubert_latent_dim,)
                keys[f"{p}.hubert_encoder.1.running_var"] = (
                    cfg.hubert_latent_dim,)
                keys[f"{p}.hubert_encoder.3.weight"] = (cfg.hubert_latent_dim,
                                                        cfg.hubert_latent_dim,
                                                        3)
        pre_proj = L + AL + exp_cond
        if cfg.add_hubert:
            pre_proj += cfg.hubert_latent_dim if cfg.encode_hubert else cfg.hubert_dim
        if cfg.classifier_free:
            keys[f"{p}.null_cond_emb"] = (1, pre_proj)
        for i in range(num_layers):
            layer(f"{p}.temporal_decoder_blocks.{i}", L, pre_proj=pre_proj)
        linear(f"{p}.out", L, feats)
    return keys
