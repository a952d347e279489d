"""Reference FGD autoencoder checkpoint conversion.

The reference evaluates FGD with a *pretrained frozen* pose autoencoder
(``ae_300.bin`` for BEAT / ``gesture_expression.pth.tar`` for SHOW) loaded
into ``HalfEmbeddingNet`` (reference runner.py:60-65,
trainers/ddpm_beat_trainer.py:320-332, models/motion_autoencoder.py:38-203).
This module maps that torch state dict onto the Flax variable tree of
:class:`diffsheg_tpu.eval.fgd_net.FgdFeatureNet`, so FGD numbers computed by
this framework are anchored to the same frozen feature space as the paper.

Torch module layout (PoseEncoderConv, motion_autoencoder.py:38-101):

  pose_encoder.net.0.{0,1}   Conv1d(dim, base, 3) + BN      -> conv0 / bn0
  pose_encoder.net.1.{0,1}   Conv1d(base, 2b, 3) + BN       -> conv1 / bn1
  pose_encoder.net.2.{0,1}   Conv1d(2b, 2b, 4, s2) + BN     -> conv2 / bn2
  pose_encoder.net.3         Conv1d(2b, base, 3)            -> conv3
  34-frame head:  out_net.{0,1,3,4,6}                       -> fc1/fcbn1/fc2/fcbn2/fc3
  88/64-frame head: out_net.{0,1,2,3,5,6,8}                 -> fc0/fcbn0/fc1/fcbn1/fc2/fcbn2/fc3
  pose_encoder.fc_mu                                        -> fc_mu
  (fc_logvar and the decoder are dropped: FGD uses mu only)

Layout transforms are the standard ones (see compat.torch_ckpt): torch
Linear (out,in) -> kernel (in,out); Conv1d (out,in,k) -> (k,in,out);
BatchNorm weight/bias -> scale/bias, running stats -> batch_stats.  The
flatten between conv3 and the first Linear is channel-major in torch
((B,C,T).flatten(1)) and the Flax net reproduces exactly that ordering, so
Linear weights convert by plain transpose.
"""

from __future__ import annotations

from typing import Any, Dict

from diffsheg_tpu.compat.torch_ckpt import _conv1d, _linear, _t
from diffsheg_tpu.eval.fgd_net import FgdNetConfig


def _bn(sd: Dict[str, Any], prefix: str):
    """torch BatchNorm1d -> (params leaf, batch_stats leaf), both wrapped in
    the _BN submodule's anonymous inner-module name."""
    params = {"BatchNorm_0": {"scale": _t(sd[f"{prefix}.weight"]),
                              "bias": _t(sd[f"{prefix}.bias"])}}
    stats = {"BatchNorm_0": {"mean": _t(sd[f"{prefix}.running_mean"]),
                             "var": _t(sd[f"{prefix}.running_var"])}}
    return params, stats


def normalize_fgd_state_dict(checkpoint: Any) -> Dict[str, Any]:
    """Unwrap the reference's checkpoint containers.

    ``load_fid_net`` (ddpm_beat_trainer.py:320-332) tries ``model_state``
    then ``state_dict`` then the raw dict, stripping ``module.`` prefixes.
    """
    sd = checkpoint
    if isinstance(sd, dict):
        for key in ("model_state", "state_dict"):
            if key in sd and isinstance(sd[key], dict):
                sd = sd[key]
                break
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def convert_fgd_state_dict(state_dict: Dict[str, Any],
                           cfg: FgdNetConfig) -> Dict[str, Any]:
    """HalfEmbeddingNet state dict -> FgdFeatureNet Flax variables."""
    sd = normalize_fgd_state_dict(state_dict)
    enc = "pose_encoder"

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for i in range(3):
        params[f"conv{i}"] = _conv1d(sd, f"{enc}.net.{i}.0")
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"{enc}.net.{i}.1")
    params["conv3"] = _conv1d(sd, f"{enc}.net.3")

    if cfg.n_frames >= 64:
        # Linear,BN,Linear,BN,LReLU,Linear,BN,LReLU,Linear
        # (motion_autoencoder.py:47-71)
        lin_idx = {"fc0": 0, "fc1": 2, "fc2": 5, "fc3": 8}
        bn_idx = {"fcbn0": 1, "fcbn1": 3, "fcbn2": 6}
    else:
        # Linear,BN,LReLU,Linear,BN,LReLU,Linear (motion_autoencoder.py:74-84)
        lin_idx = {"fc1": 0, "fc2": 3, "fc3": 6}
        bn_idx = {"fcbn1": 1, "fcbn2": 4}
    for name, i in lin_idx.items():
        params[name] = _linear(sd, f"{enc}.out_net.{i}")
    for name, i in bn_idx.items():
        params[name], stats[name] = _bn(sd, f"{enc}.out_net.{i}")

    params["fc_mu"] = _linear(sd, f"{enc}.fc_mu")

    return {"params": {"pose_encoder": params},
            "batch_stats": {"pose_encoder": stats}}


def load_torch_fgd_checkpoint(path: str, cfg: FgdNetConfig) -> Dict[str, Any]:
    """Load ``ae_300.bin`` / ``gesture_expression.pth.tar`` from disk and
    convert.  Requires torch (conversion only; inference never does)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return convert_fgd_state_dict(ckpt, cfg)
