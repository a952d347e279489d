"""diffsheg_tpu — a TPU-native speech-driven holistic expression+gesture generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of DiffSHEG (CVPR 2024):
diffusion-based, real-time, arbitrary-length joint 3D expression + gesture
generation from speech, designed for TPU hardware (MXU-friendly shapes, static
control flow, `lax.scan` samplers, `jax.sharding` data parallelism).

Subpackages
-----------
- ``config``     frozen dataclass configuration (replaces the reference's ~90 argparse flags)
- ``diffusion``  schedules, DDIM/ancestral samplers, RePaint step programs, losses
- ``models``     Flax denoiser (UniDiffuser), HuBERT encoder, FGD autoencoder
- ``ops``        Pallas TPU kernels for the hot paths
- ``audio``      on-device mel frontend, HuBERT long-audio driver, host WAV IO
- ``sampling``   windowed-outpainting streaming generation
- ``data``       dataset cache builder, native record store loader
- ``geometry``   rotation conversions (jnp) and BVH read/write (host)
- ``parallel``   mesh construction and sharding helpers
- ``train``      data-parallel train step, trainer loop, checkpointing
- ``eval``       FGD / PCK / MSE / diversity / beat-alignment metrics
- ``compat``     reference (torch ``.tar``) checkpoint conversion
"""

__version__ = "0.1.0"
