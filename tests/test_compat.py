"""Checkpoint-converter structural tests.

Builds a synthetic reference state_dict from the declared key/shape schema
(compat.torch_ckpt.expected_reference_keys, derived from
models/transformer.py:349-700) and checks conversion produces exactly the
parameter tree the Flax model initialises — every path present, every shape
right, values flowing through (weights transposed, not copied blindly).
"""

import dataclasses

import numpy as np
import pytest

import jax

from diffsheg_tpu.compat.torch_ckpt import (
    convert_unidiffuser_state_dict,
    expected_reference_keys,
)
from diffsheg_tpu.config import beat_config, show_config
from diffsheg_tpu.models.unidiffuser import init_unidiffuser


def _tiny(cfg):
    return dataclasses.replace(
        cfg.model, latent_dim=16, num_layers=2, num_heads=2, ff_size=32,
        hubert_latent_dim=8, hubert_dim=24, aud_latent_dim=12, audio_dim=10)


def _synthetic_sd(keys):
    rng = np.random.RandomState(0)
    sd = {}
    for k, shape in keys.items():
        v = rng.randn(*shape).astype(np.float32)
        if k.endswith("running_var"):
            v = np.abs(v) + 0.5  # variances must be positive
        sd[k] = v
    return sd


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_tree_paths(v, prefix + (k,)))
        return out
    return {prefix: np.asarray(tree).shape}


@pytest.mark.parametrize("preset", [beat_config, show_config])
def test_converted_tree_matches_model_init(preset):
    cfg = preset()
    mcfg = _tiny(cfg)
    sd = _synthetic_sd(expected_reference_keys(mcfg))
    variables = convert_unidiffuser_state_dict(sd, mcfg)

    _, init_vars = init_unidiffuser(mcfg, n_poses=8,
                                    rng=jax.random.PRNGKey(0))
    got_p = _tree_paths(variables["params"])
    want_p = _tree_paths(jax.tree.map(np.asarray, dict(init_vars["params"])))
    missing = set(want_p) - set(got_p)
    extra = set(got_p) - set(want_p)
    assert not missing, f"converter missing params: {sorted(missing)[:8]}"
    assert not extra, f"converter emitted unknown params: {sorted(extra)[:8]}"
    for path in want_p:
        assert got_p[path] == want_p[path], (path, got_p[path], want_p[path])

    got_s = _tree_paths(variables.get("batch_stats", {}))
    want_s = _tree_paths(jax.tree.map(np.asarray,
                                      dict(init_vars.get("batch_stats", {}))))
    assert set(got_s) == set(want_s)


def test_converted_model_runs_forward():
    cfg = _tiny(beat_config())
    sd = _synthetic_sd(expected_reference_keys(cfg))
    variables = convert_unidiffuser_state_dict(sd, cfg)
    model, _ = init_unidiffuser(cfg, n_poses=8, rng=jax.random.PRNGKey(0))

    import jax.numpy as jnp
    B, T = 2, 8
    out = model.apply(
        variables,
        jnp.ones((B, T, cfg.motion_dim)) * 0.1,
        jnp.zeros((B,), dtype=jnp.int32),
        (jnp.ones((B, 1, 1)), jnp.ones((B, 1, 1))),
        jnp.ones((B, T, cfg.audio_dim)),
        jnp.zeros((B, cfg.style_dim)),
        hubert=jnp.ones((B, T, cfg.hubert_dim)) * 0.01,
        train=False,
    )
    assert out.shape == (B, T, cfg.motion_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_linear_weights_transposed_not_copied():
    """The torch (out, in) -> flax (in, out) transpose must actually happen:
    plant a marked non-square weight and find its transpose in the tree."""
    cfg = _tiny(beat_config())
    keys = expected_reference_keys(cfg)
    sd = _synthetic_sd(keys)
    marker = np.arange(np.prod(sd["encoder_exp.joint_embed.weight"].shape),
                       dtype=np.float32).reshape(
        sd["encoder_exp.joint_embed.weight"].shape)
    sd["encoder_exp.joint_embed.weight"] = marker
    variables = convert_unidiffuser_state_dict(sd, cfg)
    got = np.asarray(variables["params"]["encoder_exp"]["joint_embed"]["kernel"])
    np.testing.assert_array_equal(got, marker.T)


@pytest.mark.parametrize("preset", [beat_config, show_config])
def test_export_roundtrip_is_identity(preset):
    """Reverse converter: synthetic reference sd -> flax -> reference sd
    must reproduce every key and every value exactly (modulo the
    num_batches_tracked counters the loader ignores)."""
    from diffsheg_tpu.compat.torch_ckpt import export_unidiffuser_state_dict

    mcfg = _tiny(preset())
    sd = _synthetic_sd(expected_reference_keys(mcfg))
    variables = convert_unidiffuser_state_dict(sd, mcfg)
    back = export_unidiffuser_state_dict(variables)
    assert sorted(back) == sorted(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_linear_speech_encoder_roundtrip():
    """The wav2vec2 variant (speech_encoder='linear', one nn.Linear at
    transformer.py:444) must convert in BOTH directions: sd -> flax tree
    matching model init, and back to the identical sd."""
    from diffsheg_tpu.compat.torch_ckpt import export_unidiffuser_state_dict

    mcfg = dataclasses.replace(_tiny(beat_config()),
                               speech_encoder="linear",
                               hubert_dim=24, hubert_latent_dim=12)
    sd = _synthetic_sd(expected_reference_keys(mcfg))
    assert "encoder_exp.hubert_encoder.weight" in sd          # the Linear
    assert "encoder_exp.hubert_encoder.0.weight" not in sd    # not the conv
    variables = convert_unidiffuser_state_dict(sd, mcfg)

    _, init_vars = init_unidiffuser(mcfg, n_poses=8,
                                    rng=jax.random.PRNGKey(0))
    assert set(_tree_paths(variables["params"])) == \
        set(_tree_paths(jax.tree.map(np.asarray, dict(init_vars["params"]))))

    back = export_unidiffuser_state_dict(variables)
    assert sorted(back) == sorted(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_export_rejects_unrepresentable_trees():
    """Trees with no reference layout must fail loudly, not export a
    silently-incomplete tar: single-branch models and the completed
    text/emo hooks (upstream never defines those modules,
    transformer.py:519-527)."""
    from diffsheg_tpu.compat.torch_ckpt import export_unidiffuser_state_dict

    mcfg = _tiny(beat_config())
    sd = _synthetic_sd(expected_reference_keys(mcfg))
    variables = convert_unidiffuser_state_dict(sd, mcfg)

    single = {"params": {k: v for k, v in variables["params"].items()
                         if k != "encoder_ges"}}
    with pytest.raises(ValueError, match="encoder_ges"):
        export_unidiffuser_state_dict(single)

    hooked = {"params": dict(variables["params"]),
              "batch_stats": variables["batch_stats"]}
    hooked["params"]["encoder_exp"] = dict(hooked["params"]["encoder_exp"])
    hooked["params"]["encoder_exp"]["text_embed"] = {
        "embedding": np.zeros((5, 4), np.float32)}
    with pytest.raises(ValueError, match="text_embed"):
        export_unidiffuser_state_dict(hooked)


def test_save_reference_checkpoint_loads_back(tmp_path):
    """The .tar written by save_reference_checkpoint round-trips through
    load_reference_checkpoint (the torch.save container format the
    reference trainer reads, ddpm_beat_trainer.py:282-318)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from diffsheg_tpu.compat.torch_ckpt import (
        load_reference_checkpoint,
        save_reference_checkpoint,
    )

    mcfg = _tiny(beat_config())
    _, variables = init_unidiffuser(mcfg, n_poses=8,
                                    rng=jax.random.PRNGKey(3))
    path = str(tmp_path / "export.tar")
    save_reference_checkpoint(variables, path, epoch=7, total_it=123)

    import torch as _torch
    raw = _torch.load(path, map_location="cpu", weights_only=False)
    assert raw["ep"] == 7 and raw["total_it"] == 123

    got = load_reference_checkpoint(path, mcfg)
    want_p = _tree_paths(variables["params"])
    got_p = _tree_paths(got["params"])
    assert got_p == want_p
    # spot-check exact values through the double conversion
    np.testing.assert_array_equal(
        np.asarray(got["params"]["encoder_ges"]["out"]["kernel"]),
        np.asarray(variables["params"]["encoder_ges"]["out"]["kernel"]))
