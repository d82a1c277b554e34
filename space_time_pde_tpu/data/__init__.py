from space_time_pde_tpu.data.dataset import RB2DataLoader
from space_time_pde_tpu.data.dataset4d import Field4DDataset
from space_time_pde_tpu.data.generator import (
    abc_flow_fields,
    simulate_rb2d,
    taylor_green_fields,
    save_npz,
)

__all__ = [
    "RB2DataLoader",
    "Field4DDataset",
    "abc_flow_fields",
    "simulate_rb2d",
    "taylor_green_fields",
    "save_npz",
]
