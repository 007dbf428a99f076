from catgen.train.gan import (  # noqa: F401
    GanConfig,
    StepMetrics,
    TrainState,
    bce,
    discriminate,
    generate,
    init_state,
    make_train_epoch,
    make_train_step,
    uniform_noise,
)
from catgen.train import synthetic  # noqa: F401
from catgen.train.v_trainer import (  # noqa: F401
    VConfig,
    VStepMetrics,
    VTrainState,
    rate_with_v,
    v_scores,
)
from catgen.train import v_trainer  # noqa: F401
from catgen.train import pretrainer  # noqa: F401
from catgen.train.pretrainer import AEState, PretrainConfig  # noqa: F401
