from .hand_utils import (
    CanonPose,
    camera_frame,
    canonicalize,
    decanonicalize,
    handkp2palmkp,
    kp2bone_lengths,
    kp_bones,
    solve_hand_frame,
)
from .hand_network import (
    HandTrackNet,
    IKNet,
    hand_tracknet_loss,
    iknet_loss,
    iknet_predict_kp,
    l1_loss,
    l2_loss,
    rotation_diff_deg,
)

__all__ = [
    "CanonPose", "camera_frame", "canonicalize", "decanonicalize",
    "handkp2palmkp", "kp2bone_lengths", "kp_bones", "solve_hand_frame",
    "HandTrackNet", "IKNet", "hand_tracknet_loss", "iknet_loss",
    "iknet_predict_kp", "l1_loss", "l2_loss", "rotation_diff_deg",
]

from . import losses
from .hand_utils import jitter_hand_mano, obb_frame
