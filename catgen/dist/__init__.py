from catgen.dist.mesh import (  # noqa: F401
    DATA_AXIS,
    fold_in_axis_index,
    initialize,
    make_mesh,
    replicate,
    shard_batch,
)
from catgen.dist.dp import (  # noqa: F401
    make_dp_train_epoch,
    make_dp_train_step,
    make_dp_v_step,
    make_dp_v_epoch,
    make_dp_ae_step,
    make_dp_ae_epoch,
)
