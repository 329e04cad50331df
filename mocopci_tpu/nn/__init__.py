"""Neural building blocks (flax.linen, channels-last)."""
from mocopci_tpu.nn.attention import (
    CrossAttention,
    CrossFrameBlock,
    EICrossformer,
    Extractor,
    Injector,
    MultiFrameBlock,
)
from mocopci_tpu.nn.basic import (
    BatchNorm,
    compute_dtype,
    set_compute_dtype,
    ConvLReLU,
    DropPath,
    EasyMlp,
    FrameBatchNorm,
    Mlp,
    MlpT,
    PReLU,
    WeightNet,
)
from mocopci_tpu.nn.cross import (
    BidirectionalLayerFeatCosine,
    CrossLayerFeatCosine,
    FlowEmbeddingLayer,
)
from mocopci_tpu.nn.pointconv import PointConv, PointConvD
from mocopci_tpu.nn.transformer import PointTransformerBlock
from mocopci_tpu.nn.pointnet2_modules import (
    FeaturePropagation,
    SetAbstraction,
    query_and_group,
)
from mocopci_tpu.nn.refine import FlowRefineNet
