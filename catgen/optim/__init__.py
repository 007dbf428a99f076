from catgen.optim.optimizers import (  # noqa: F401
    Optimizer,
    adagrad,
    adam,
    apply_updates,
    clamp_and_penalize,
    flat_init,
    flat_update,
    make,
    opt_state_to_flat,
    opt_state_to_tree,
    rmsprop,
    sgd,
)
