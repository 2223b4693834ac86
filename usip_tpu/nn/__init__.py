from usip_tpu.nn.layers import (
    BatchNorm,
    PointNetFusion,
    PointwiseLayer,
    SharedMLP,
    activation_fn,
    bn_momentum_schedule,
)

__all__ = [
    "BatchNorm",
    "PointNetFusion",
    "PointwiseLayer",
    "SharedMLP",
    "activation_fn",
    "bn_momentum_schedule",
]
