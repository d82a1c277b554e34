from space_time_pde_tpu.ops.grid_interp import (
    corner_offsets,
    gather_corner_feats,
    grid_interp_coefficients,
    multilinear_interp,
)
from space_time_pde_tpu.ops.jet import (
    decode_blend_jet,
    multilinear_weight_jet,
    query_local_implicit_grid_jet,
)

__all__ = [
    "corner_offsets",
    "gather_corner_feats",
    "grid_interp_coefficients",
    "multilinear_interp",
    "decode_blend_jet",
    "multilinear_weight_jet",
    "query_local_implicit_grid_jet",
]
