from space_time_pde_tpu.utils.config import Config, add_args, config_from_args
from space_time_pde_tpu.utils.logging import MetricsLogger
from space_time_pde_tpu.utils.timing import Timer, throughput

__all__ = [
    "Config", "add_args", "config_from_args", "MetricsLogger", "Timer",
    "throughput",
]
