"""Utilities: logging/observability, profiling, smoothing filters."""

from diffsheg_tpu.utils.logging import MetricLogger  # noqa: F401
from diffsheg_tpu.utils.filters import motion_temporal_filter  # noqa: F401
from diffsheg_tpu.utils.profiling import StageTimer, device_trace  # noqa: F401
