"""Multi-chip SERVING: batch-sharded generation over a device mesh.

Training is mesh-sharded already (train/step.py); this pins the serving
story: every sampling op is batch-parallel, so placing the inputs with a
batch NamedSharding lets GSPMD run the SAME compiled window programs
sharded over the `data` axis — styles/sequences spread across chips with
no code changes, and the outputs must be bit-comparable to the unsharded
run (same rng, same programs).

The reference serves one GPU at a time (its style loop is serial,
trainers/ddpm_beat_trainer.py:1269-1311); here 8 virtual devices each
take a slice of the style batch.
"""

import pytest

pytestmark = pytest.mark.slow  # long-running: excluded from the core tier (pytest -m "not slow")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffsheg_tpu.config import beat_config
from diffsheg_tpu.models.unidiffuser import init_unidiffuser
from diffsheg_tpu.parallel.mesh import make_mesh
from diffsheg_tpu.sampling.generator import WindowGenerator
from diffsheg_tpu.sampling.streamer import StreamingGenerator


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_batch_sharded_generation_matches_single_device():
    cfg = beat_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
        add_hubert=False))
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(0))
    gen = WindowGenerator(cfg, variables)
    stream = StreamingGenerator(gen)

    B, T = 8, 70
    rs = np.random.RandomState(1)
    mel = jnp.asarray(rs.randn(B, T, cfg.model.audio_dim), jnp.float32)
    pid = jax.nn.one_hot(jnp.arange(B) % cfg.model.style_dim,
                         cfg.model.style_dim)
    rng = jax.random.PRNGKey(2)

    ref = np.asarray(stream.generate(mel, pid, rng))

    mesh = make_mesh(cfg.mesh)  # (data=8,) over the virtual CPU devices
    data_axis = mesh.axis_names[0]
    mel_s = jax.device_put(mel, NamedSharding(mesh, P(data_axis, None, None)))
    pid_s = jax.device_put(pid, NamedSharding(mesh, P(data_axis, None)))
    with mesh:
        out = stream.generate(mel_s, pid_s, rng)
    # the output really is distributed over the mesh
    assert len(out.sharding.device_set) == 8, out.sharding
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_batch_sharded_fused_stream_matches():
    """The single-dispatch whole-stream scan also shards over batch."""
    cfg = beat_config()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, latent_dim=32, num_layers=1, num_heads=2, ff_size=64,
        add_hubert=False))
    _, variables = init_unidiffuser(cfg.model, cfg.data.n_poses,
                                    jax.random.PRNGKey(3))
    stream = StreamingGenerator(WindowGenerator(cfg, variables))

    B, T = 8, 70
    rs = np.random.RandomState(4)
    mel = jnp.asarray(rs.randn(B, T, cfg.model.audio_dim), jnp.float32)
    pid = jax.nn.one_hot(jnp.arange(B) % cfg.model.style_dim,
                         cfg.model.style_dim)
    rng = jax.random.PRNGKey(5)

    ref = np.asarray(stream.generate_fused(mel, pid, rng))
    mesh = make_mesh(cfg.mesh)
    data_axis = mesh.axis_names[0]
    mel_s = jax.device_put(mel, NamedSharding(mesh, P(data_axis, None, None)))
    pid_s = jax.device_put(pid, NamedSharding(mesh, P(data_axis, None)))
    with mesh:
        out = stream.generate_fused(mel_s, pid_s, rng)
    assert len(out.sharding.device_set) == 8, out.sharding
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)
