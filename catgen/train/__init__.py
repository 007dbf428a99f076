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
