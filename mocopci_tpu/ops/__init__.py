"""TPU-native point-cloud op library.

One library replaces both copies of the reference's CUDA extension
(``pointnet2/`` and ``models/pointnet2/`` are byte-identical) plus the
``models/EMD`` extension and the pytorch3d kNN/Chamfer dependencies.
"""
from mocopci_tpu.ops.ball_query import ball_query
from mocopci_tpu.ops.chamfer import (
    chamfer_distance,
    chamfer_many,
    chamfer_distance_blocked,
    chamfer_distance_per_sample,
)
from mocopci_tpu.ops.distance import (
    cosine_distance,
    knn,
    knn_cosine,
    set_knn_mode,
    square_distance,
)
from mocopci_tpu.ops.emd import (
    approx_match,
    earth_mover_distance,
    earth_mover_distance_auto,
    earth_mover_distance_blocked,
    emd,
    match_cost,
    set_emd_fast,
)
from mocopci_tpu.ops.interpolate import (
    point_warp,
    three_interpolate,
    three_nn,
    upsample,
    upsample_multi,
)
from mocopci_tpu.ops.sampling import (
    downsample_fps,
    farthest_point_sample,
    farthest_point_sample_pyramid,
    farthest_point_sample_xla,
    gather,
    group,
    group_multi,
)

__all__ = [
    "ball_query",
    "chamfer_distance",
    "chamfer_many",
    "chamfer_distance_blocked",
    "chamfer_distance_per_sample",
    "cosine_distance",
    "knn",
    "knn_cosine",
    "set_knn_mode",
    "square_distance",
    "approx_match",
    "earth_mover_distance",
    "earth_mover_distance_auto",
    "earth_mover_distance_blocked",
    "emd",
    "match_cost",
    "set_emd_fast",
    "point_warp",
    "three_interpolate",
    "three_nn",
    "upsample",
    "upsample_multi",
    "downsample_fps",
    "farthest_point_sample",
    "farthest_point_sample_pyramid",
    "farthest_point_sample_xla",
    "gather",
    "group",
    "group_multi",
]
