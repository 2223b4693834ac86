from usip_tpu.nn.layers import (
    BatchNorm,
    KNNFusionGroupModule,
    KNNGroupModule,
    PointNetFusion,
    PointResNet,
    PointwiseLayer,
    SharedMLP,
    UpConv,
    activation_fn,
    bn_momentum_schedule,
)

__all__ = [
    "BatchNorm",
    "KNNFusionGroupModule",
    "KNNGroupModule",
    "PointNetFusion",
    "PointResNet",
    "PointwiseLayer",
    "SharedMLP",
    "UpConv",
    "activation_fn",
    "bn_momentum_schedule",
]
