from space_time_pde_tpu.models.imnet import ImNet
from space_time_pde_tpu.models.unet3d import UNet3d, ResBlock3D
from space_time_pde_tpu.models.unet4d import UNet4d, ResBlock4D, Conv4d
from space_time_pde_tpu.models.local_implicit_grid import (
    query_local_implicit_grid,
)

__all__ = ["ImNet", "UNet3d", "ResBlock3D", "UNet4d", "ResBlock4D",
           "Conv4d", "query_local_implicit_grid"]
