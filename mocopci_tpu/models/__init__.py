from mocopci_tpu.models.mocopci import (
    MoCoPCI,
    MultiFrameEstimator,
    PointConvEncoder,
    area_resize_matrix,
    time_embedding,
)
