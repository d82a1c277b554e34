from space_time_pde_tpu.ops.grid_interp import (
    corner_offsets,
    grid_interp_coefficients,
    multilinear_interp,
)

__all__ = [
    "corner_offsets",
    "grid_interp_coefficients",
    "multilinear_interp",
]
