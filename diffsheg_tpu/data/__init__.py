"""Data layer: memory-mapped caches, BEAT/SHOW datasets, sharded loader."""

from diffsheg_tpu.data.cache import (  # noqa: F401
    ArrayCache,
    CacheWriter,
    cache_exists,
)
from diffsheg_tpu.data.beat import (  # noqa: F401
    BeatBuildConfig,
    BeatDataset,
    BeatStats,
    build_beat_cache,
    compute_beat_stats,
    motion_window_passes_filter,
    semantic_scores_per_frame,
)
from diffsheg_tpu.data.show import (  # noqa: F401
    ShowDataset,
    ShowStats,
    combine_expression,
    extract_gesture,
    inv_standardize,
    reassemble_smplx,
    standardize,
)
from diffsheg_tpu.data.loader import (  # noqa: F401
    ShardedBatchLoader,
    device_put_sharded,
)
from diffsheg_tpu.data.beat_preprocess import (  # noqa: F401
    channel_stats,
    export_bvh_rot_dir,
    make_vis_template,
    subselect_and_downsample,
)
from diffsheg_tpu.data.show_cache import (  # noqa: F401
    ShowBuildConfig,
    build_show_cache,
    compute_show_stats,
)
