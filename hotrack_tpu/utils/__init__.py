from .dicts import (
    Timer,
    add_dict,
    cvt_numpy,
    detach_dict,
    divide_dict,
    log_loss_summary,
    merge_dict,
)

__all__ = ["Timer", "add_dict", "cvt_numpy", "detach_dict", "divide_dict",
           "log_loss_summary", "merge_dict"]

from . import torch_convert, vis
