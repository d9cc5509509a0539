from .schema import PRESUBSAMPLE_FACTOR, RawFrame, empty_frame, pad_points, stack_frames
from .pipeline import jitter_hand_kp, jitter_obj_pose, prepare_batch
from .dataset import (
    BatchIterator,
    SequenceData,
    SingleFrameData,
    get_dataloader,
    get_dataset,
)

__all__ = [
    "PRESUBSAMPLE_FACTOR", "RawFrame", "empty_frame", "pad_points",
    "stack_frames", "jitter_hand_kp", "jitter_obj_pose", "prepare_batch",
    "BatchIterator", "SequenceData", "SingleFrameData", "get_dataloader",
    "get_dataset",
]
