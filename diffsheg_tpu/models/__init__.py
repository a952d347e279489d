from diffsheg_tpu.models.embeddings import (
    timestep_embedding,
    sinusoidal_position_table,
    positional_encoding,
)
from diffsheg_tpu.models.blocks import StylizationBlock, FFN, DiffusionTransformerLayer
from diffsheg_tpu.models.attention import LinearTemporalSelfAttention
from diffsheg_tpu.models.denoiser import MotionDenoiser
from diffsheg_tpu.models.unidiffuser import UniDiffuser
