from space_time_pde_tpu.train.trainer import (
    TrainState,
    build_models,
    init_state,
    make_eval_fn,
    make_loss_fn,
    make_train_step,
)

__all__ = [
    "TrainState", "build_models", "init_state", "make_eval_fn",
    "make_loss_fn", "make_train_step",
]
