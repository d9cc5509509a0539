from .fps import farthest_point_sample_pallas

__all__ = ["farthest_point_sample_pallas"]
