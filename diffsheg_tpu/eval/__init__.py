"""Evaluation: FGD feature net, Frechet distance, pose metrics."""

from diffsheg_tpu.eval.fgd import FgdCalculator, fgd_from_positions  # noqa: F401
from diffsheg_tpu.eval.fgd_net import (  # noqa: F401
    FgdFeatureNet,
    FgdNetConfig,
    init_fgd_net,
)
from diffsheg_tpu.eval.metrics import (  # noqa: F401
    activation_statistics,
    beat_alignment,
    diversity,
    euclidean_distance_matrix,
    frechet_distance,
    frechet_from_activations,
    mse_pck,
    multimodality,
    r_precision,
)
