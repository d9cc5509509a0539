from .decoder import SDFDecoder, WNDense
from .volume import bake_sdf_volume, nearest_sdf, trilinear_sdf, volume_coords

__all__ = [
    "SDFDecoder", "WNDense", "bake_sdf_volume", "nearest_sdf",
    "trilinear_sdf", "volume_coords",
]
