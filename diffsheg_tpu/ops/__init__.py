"""Custom TPU kernels (Pallas)."""

from diffsheg_tpu.ops.linear_attention import (  # noqa: F401
    fused_linear_attention,
    linear_attention,
    linear_attention_reference,
    supports_pallas,
)
