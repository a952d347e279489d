"""FGD feature-net parity vs the reference HalfEmbeddingNet (gated).

Builds the reference torch autoencoder (models/motion_autoencoder.py:38-203),
converts its state dict with compat.fgd_ckpt, and asserts the Flax net
produces the same mu latents — the same pattern test_reference_parity.py
uses for UniDiffuser.  This anchors every FGD number this framework reports
to the reference's frozen feature space.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REF = os.environ.get("DIFFSHEG_REFERENCE", "/root/reference")

if not os.path.isdir(os.path.join(REF, "models")):
    pytest.skip("reference checkout not available", allow_module_level=True)

torch = pytest.importorskip("torch")

sys.path.insert(0, REF)
try:
    from models.motion_autoencoder import HalfEmbeddingNet  # noqa: E402
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference import failed: {e}", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from diffsheg_tpu.compat.fgd_ckpt import (  # noqa: E402
    convert_fgd_state_dict,
    normalize_fgd_state_dict,
)
from diffsheg_tpu.eval.fgd_net import FgdFeatureNet, FgdNetConfig  # noqa: E402


def _make_ref_net(n_poses, dim, seed=0):
    torch.manual_seed(seed)
    args = SimpleNamespace(n_poses=n_poses, net_dim_pose=dim, vae_length=300)
    net = HalfEmbeddingNet(args)
    # push the BatchNorm running stats away from (0, 1) so the test actually
    # exercises the batch_stats conversion, then freeze (the reference only
    # ever uses the net frozen, ddpm_beat_trainer.py:48-50)
    net.train()
    with torch.no_grad():
        for _ in range(3):
            net(torch.randn(8, n_poses, dim))
    net.eval()
    return net


@pytest.mark.parametrize("n_poses,dim", [(34, 192), (88, 232)])
def test_latents_match_reference(n_poses, dim):
    net = _make_ref_net(n_poses, dim)
    cfg = FgdNetConfig(n_frames=n_poses, pose_dim=dim, feature_length=300)
    variables = convert_fgd_state_dict(net.state_dict(), cfg)

    x = np.random.RandomState(1).randn(4, n_poses, dim).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    ours = np.asarray(FgdFeatureNet(cfg).apply(variables, jnp.asarray(x)))

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_container_and_prefix_unwrapping():
    """load_fid_net accepts {'model_state'|'state_dict': ...} and module.
    prefixes (ddpm_beat_trainer.py:320-332); the converter must too."""
    net = _make_ref_net(34, 192, seed=1)
    sd = net.state_dict()
    wrapped = {"model_state": {f"module.{k}": v for k, v in sd.items()}}
    flat = normalize_fgd_state_dict(wrapped)
    assert set(flat) == set(sd)

    cfg = FgdNetConfig(n_frames=34, pose_dim=192, feature_length=300)
    v1 = convert_fgd_state_dict(wrapped, cfg)
    v2 = convert_fgd_state_dict(sd, cfg)
    a = np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree.leaves(v1)])
    b = np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree.leaves(v2)])
    np.testing.assert_array_equal(a, b)


def test_fgd_identical_given_same_net():
    """End-to-end: FGD computed from converted latents equals FGD computed
    from reference latents on the same generated/real sets."""
    from diffsheg_tpu.eval.metrics import (
        activation_statistics,
        frechet_distance,
    )

    net = _make_ref_net(34, 192, seed=2)
    cfg = FgdNetConfig(n_frames=34, pose_dim=192, feature_length=300)
    variables = convert_fgd_state_dict(net.state_dict(), cfg)

    rng = np.random.RandomState(3)
    gen = rng.randn(32, 34, 192).astype(np.float32)
    real = (rng.randn(32, 34, 192) * 0.8 + 0.3).astype(np.float32)

    with torch.no_grad():
        g_ref = net(torch.from_numpy(gen)).numpy()
        r_ref = net(torch.from_numpy(real)).numpy()
    model = FgdFeatureNet(cfg)
    g_ours = np.asarray(model.apply(variables, jnp.asarray(gen)))
    r_ours = np.asarray(model.apply(variables, jnp.asarray(real)))

    fgd_ref = frechet_distance(*activation_statistics(g_ref),
                               *activation_statistics(r_ref))
    fgd_ours = frechet_distance(*activation_statistics(g_ours),
                                *activation_statistics(r_ours))
    assert fgd_ref == pytest.approx(fgd_ours, rel=1e-3)
