from space_time_pde_tpu.parallel.dp import (
    global_batch,
    init_multihost,
    make_dp_multi_step,
    make_dp_train_step,
    make_mesh,
    replicate_state,
    shard_batch,
)

__all__ = [
    "global_batch", "init_multihost", "make_dp_multi_step",
    "make_dp_train_step", "make_mesh", "replicate_state", "shard_batch",
]
