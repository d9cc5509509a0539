from .types import HandTrackResult, ObjTrackResult
from .hand import track_hand_sequence
from .obj import track_obj_sequence
from .stream import HandTracker, ObjTracker, serve_combined

__all__ = ["HandTrackResult", "ObjTrackResult", "track_hand_sequence",
           "track_obj_sequence", "HandTracker", "ObjTracker", "serve_combined"]
