"""Frozen FGD feature extractor (Flax).

Functional equivalent of the reference's evaluation autoencoder (reference
models/motion_autoencoder.py:38-203, built with ``vae_length=300`` and
``net_dim_pose`` frames x channels per runner.py:60-65,127,170): a 1-D conv
encoder over time followed by an MLP head; the 300-d ``mu`` latent feeds the
Frechet Gesture Distance.

Quirk preserved for checkpoint parity: the reference constructs the MLP-head
activations as ``nn.LeakyReLU(True)`` — i.e. negative_slope=1.0, the identity
function — so only the conv stack has real (slope-0.2) nonlinearities.  We
reproduce that exactly; a converted reference checkpoint must produce the
same latents.

BatchNorm runs in inference mode with stored running statistics (the net is
only ever used frozen, reference ddpm_beat_trainer.py:320-332).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class FgdNetConfig:
    n_frames: int = 34        # training window (34 BEAT / 88 SHOW)
    pose_dim: int = 192       # channels scored (gesture+expression for BEAT)
    feature_length: int = 300 # latent width (runner.py:170 vae_length)

    @property
    def conv_out_frames(self) -> int:
        # k3s1, k3s1, k4s2, k3s1 over n_frames
        t = self.n_frames - 2      # conv k3
        t = t - 2                  # conv k3
        t = (t - 4) // 2 + 1       # conv k4 s2
        return t - 2               # conv k3


class _BN(nn.Module):
    """Inference-mode batchnorm over the channel axis."""
    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.BatchNorm(use_running_average=True, axis=-1,
                            epsilon=1e-5, momentum=0.9)(x)


class PoseEncoder(nn.Module):
    """Conv1d tower + MLP head -> (z, mu, logvar).

    Layout mirrors PoseEncoderConv (motion_autoencoder.py:38-101); data is
    kept time-major (B, T, C) so Conv uses feature_group_count-free NTC
    layout, which XLA maps directly onto the MXU.
    """

    cfg: FgdNetConfig

    @nn.compact
    def __call__(self, poses: jax.Array) -> jax.Array:
        c = self.cfg
        base = c.feature_length
        x = poses  # (B, T, C)

        def conv(feat, kernel, stride, name):
            return nn.Conv(feat, kernel_size=(kernel,), strides=(stride,),
                           padding="VALID", name=name)

        x = conv(base, 3, 1, "conv0")(x)
        x = _BN(base, name="bn0")(x)
        x = nn.leaky_relu(x, 0.2)
        x = conv(base * 2, 3, 1, "conv1")(x)
        x = _BN(base * 2, name="bn1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = conv(base * 2, 4, 2, "conv2")(x)
        x = _BN(base * 2, name="bn2")(x)
        x = nn.leaky_relu(x, 0.2)
        x = conv(base, 3, 1, "conv3")(x)

        # flatten channel-major to match torch's (B, C, T).flatten(1)
        x = jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)

        if c.n_frames >= 64:
            # 88/64-frame head (motion_autoencoder.py:47-71)
            x = nn.Dense(base * 12, name="fc0")(x)
            x = _BN(base * 12, name="fcbn0")(x)
            x = nn.Dense(base * 4, name="fc1")(x)
        else:
            # 34-frame head (motion_autoencoder.py:74-84)
            x = nn.Dense(base * 4, name="fc1")(x)
        x = _BN(base * 4, name="fcbn1")(x)
        # NOTE: LeakyReLU(True) == identity in the reference; intentionally
        # no activation here (see module docstring).
        x = nn.Dense(base * 2, name="fc2")(x)
        x = _BN(base * 2, name="fcbn2")(x)
        x = nn.Dense(base, name="fc3")(x)

        mu = nn.Dense(base, name="fc_mu")(x)
        return mu


class FgdFeatureNet(nn.Module):
    """HalfEmbeddingNet equivalent: encoder-only, returns the mu latent
    (motion_autoencoder.py:192-203)."""

    cfg: FgdNetConfig

    @nn.compact
    def __call__(self, poses: jax.Array) -> jax.Array:
        return PoseEncoder(self.cfg, name="pose_encoder")(poses)


def init_fgd_net(cfg: FgdNetConfig, rng: Optional[jax.Array] = None):
    """Initialise (model, variables) with dummy input."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    model = FgdFeatureNet(cfg)
    x = jnp.zeros((1, cfg.n_frames, cfg.pose_dim))
    variables = model.init(rng, x)
    return model, variables
