from catgen.optim.optimizers import (  # noqa: F401
    Optimizer,
    adagrad,
    adam,
    apply_updates,
    clamp_and_penalize,
    make,
    rmsprop,
    sgd,
)
