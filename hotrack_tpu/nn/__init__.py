from .norm import BatchNorm, GroupNorm
from .blocks import MLPConv, RearrangeModule, position_embedding_sine
from .pointnet2 import (
    FeaturePropagation,
    SetAbstractionAll,
    SetAbstractionAtCenters,
    SetAbstractionMsg,
    SharedMLP,
)
from .transformer import AttnModule, TransT
from .backbones import PointNet2Encoder, PointNet2Msg

__all__ = [
    "BatchNorm", "GroupNorm", "MLPConv", "RearrangeModule",
    "position_embedding_sine", "FeaturePropagation", "SetAbstractionAll",
    "SetAbstractionAtCenters", "SetAbstractionMsg", "SharedMLP",
    "AttnModule", "TransT", "PointNet2Encoder", "PointNet2Msg",
]

from .point_transformer import (
    PointTransformerDownBlock,
    PointTransformerLayer,
    PointTransformerResBlock,
    PointTransformerTransitionDown,
    PointTransformerTransitionUp,
    PointTransformerUpBlock,
)
