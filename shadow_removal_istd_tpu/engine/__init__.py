"""Engine: config, state, jitted steps, trainer loop, checkpointing."""

from shadow_removal_istd_tpu.engine.config import TrainConfig  # noqa: F401
from shadow_removal_istd_tpu.engine.loop import (  # noqa: F401
    RunConfig,
    Trainer,
)
from shadow_removal_istd_tpu.engine.state import (  # noqa: F401
    Models,
    TrainState,
    build_models,
    init_state,
    make_optimizers,
)
from shadow_removal_istd_tpu.engine.steps import (  # noqa: F401
    make_eval_step,
    make_infer_step,
    make_train_step,
)
