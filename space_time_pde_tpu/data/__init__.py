from space_time_pde_tpu.data.dataset import RB2DataLoader
from space_time_pde_tpu.data.generator import (
    simulate_rb2d,
    taylor_green_fields,
    save_npz,
)

__all__ = [
    "RB2DataLoader",
    "simulate_rb2d",
    "taylor_green_fields",
    "save_npz",
]
