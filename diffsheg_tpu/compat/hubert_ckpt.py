"""HuggingFace HuBERT checkpoint -> Flax params converter.

The reference loads ``facebook/hubert-large-ls960-ft`` through torch
transformers at inference time (reference trainers/ddpm_beat_trainer.py:
1132-1137).  This module maps that torch ``state_dict`` onto the parameter
tree of :class:`diffsheg_tpu.models.hubert.HubertModel` so the speech
frontend runs natively on TPU.

Covers the HF layout for ``do_stable_layer_norm=True`` / ``feat_extract_norm
='layer'`` models (the -large family), including the weight-norm
parametrization of the positional conv (both the legacy ``weight_g/weight_v``
names and the torch>=2.1 ``parametrizations.weight.original0/1`` names).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from diffsheg_tpu.models.hubert import HubertConfig


def _t(x) -> np.ndarray:
    """torch tensor / array -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _dense(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _t(sd[f"{prefix}.weight"]).T,
            "bias": _t(sd[f"{prefix}.bias"])}


def _ln(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _conv(sd: Mapping, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    # torch conv1d weight (out, in/groups, k) -> flax (k, in/groups, out)
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if bias:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _pos_conv_weight(sd: Mapping, prefix: str) -> np.ndarray:
    """Reconstruct the weight-normed positional conv weight.

    wav2vec2/hubert apply ``nn.utils.weight_norm(conv, dim=2)``:
    w = g * v / ||v||, with the norm over dims (0, 1) per kernel position.
    """
    if f"{prefix}.weight" in sd:  # already materialized
        return _t(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_g" in sd:
        g = _t(sd[f"{prefix}.weight_g"])
        v = _t(sd[f"{prefix}.weight_v"])
    else:  # torch >= 2.1 parametrize names
        g = _t(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _t(sd[f"{prefix}.parametrizations.weight.original1"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def convert_hubert_state_dict(sd: Mapping[str, Any],
                              cfg: HubertConfig = None) -> Dict[str, Any]:
    """HF torch state_dict -> flax {'params': ...} for HubertModel."""
    cfg = cfg or HubertConfig()
    # tolerate a wrapping 'hubert.' prefix (e.g. HubertForCTC checkpoints)
    if not any(k.startswith("feature_extractor") for k in sd) and any(
            k.startswith("hubert.") for k in sd):
        sd = {k[len("hubert."):]: v for k, v in sd.items()
              if k.startswith("hubert.")}

    p: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        fe[f"conv_{i}"] = _conv(sd, f"{base}.conv",
                                bias=f"{base}.conv.bias" in sd)
        if cfg.conv_norm == "group_first":
            if i == 0:  # GroupNorm affine params (wav2vec2 'group' mode)
                fe["gn_scale"] = _t(sd[f"{base}.layer_norm.weight"])
                fe["gn_bias"] = _t(sd[f"{base}.layer_norm.bias"])
        else:
            fe[f"ln_{i}"] = _ln(sd, f"{base}.layer_norm")
    p["feature_extractor"] = fe

    p["feat_proj_ln"] = _ln(sd, "feature_projection.layer_norm")
    p["feat_proj"] = _dense(sd, "feature_projection.projection")

    w = _pos_conv_weight(sd, "encoder.pos_conv_embed.conv")
    p["pos_conv"] = {"conv": {
        "kernel": w.transpose(2, 1, 0),
        "bias": _t(sd["encoder.pos_conv_embed.conv.bias"]),
    }}

    for i in range(cfg.num_layers):
        base = f"encoder.layers.{i}"
        # pre-LN (stable) and post-LN share key names: 'layer_norm' is the
        # attention-side norm, 'final_layer_norm' the ffn-side norm
        p[f"layer_{i}"] = {
            "attn_ln": _ln(sd, f"{base}.layer_norm"),
            "attn": {
                "q_proj": _dense(sd, f"{base}.attention.q_proj"),
                "k_proj": _dense(sd, f"{base}.attention.k_proj"),
                "v_proj": _dense(sd, f"{base}.attention.v_proj"),
                "out_proj": _dense(sd, f"{base}.attention.out_proj"),
            },
            "ffn_ln": _ln(sd, f"{base}.final_layer_norm"),
            "fc1": _dense(sd, f"{base}.feed_forward.intermediate_dense"),
            "fc2": _dense(sd, f"{base}.feed_forward.output_dense"),
        }

    p["final_ln"] = _ln(sd, "encoder.layer_norm")
    return {"params": p}


def load_hf_hubert(name_or_path: str = "facebook/hubert-large-ls960-ft",
                   cfg: HubertConfig = None) -> Dict[str, Any]:
    """Load + convert a pretrained HF HuBERT (requires transformers+torch)."""
    from transformers import HubertModel as HFHubert  # local import

    hf = HFHubert.from_pretrained(name_or_path)
    return convert_hubert_state_dict(hf.state_dict(), cfg)
