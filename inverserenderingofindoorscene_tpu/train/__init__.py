from inverserenderingofindoorscene_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_brdf_train_step,
    make_light_train_step,
    reference_adam,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_brdf_train_step",
    "make_light_train_step",
    "reference_adam",
]
