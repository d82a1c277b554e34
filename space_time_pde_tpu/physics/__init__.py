from space_time_pde_tpu.physics.pde import PDELayer
from space_time_pde_tpu.physics.rb2 import get_rb2_pde_layer

__all__ = ["PDELayer", "get_rb2_pde_layer"]
