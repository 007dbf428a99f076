"""Two-process jax.distributed smoke test (multi-host DP readiness).

Each process contributes 2 virtual CPU devices; the 4-device global mesh
runs 2 DP GAN train steps with tiny models; every process feeds its LOCAL
real shard via ``jax.make_array_from_process_local_data`` and asserts the
replicated parameters stay bit-identical across its addressable devices.
This is the DCN-layer recipe of SURVEY.md §2.3: ``jax.distributed`` for
process bring-up, one global ``Mesh``, XLA collectives for everything else.

Launched by tests/test_multihost.py as:
    python tools/multihost_smoke.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys

# repo-root import bootstrap (python tools/x.py puts tools/ on sys.path,
# not the repo root; the in-process catgen imports below need this)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(coordinator, nproc, pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from catgen import dist, nn  # noqa: E402
from catgen.train import gan  # noqa: E402


assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc
IMG = (8, 8, 1)

g = nn.Sequential([nn.Dense(16), nn.PReLU(),
                   nn.Dense(IMG[0] * IMG[1] * IMG[2]), nn.Sigmoid(),
                   nn.Reshape(IMG)], name="g")
d = nn.Sequential([nn.Flatten(), nn.Dense(16), nn.PReLU(), nn.Dense(1),
                   nn.Sigmoid()], name="d")
config = gan.GanConfig(batch_size=4, noise_dim=8, acc_window=4,
                       axis_name=dist.DATA_AXIS)
mesh = dist.make_mesh(jax.device_count())
state = gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG)
state = dist.replicate(state, mesh)
step = dist.make_dp_train_step(g, d, config, mesh)

half = config.batch_size // 2
sharding = NamedSharding(mesh, P(dist.DATA_AXIS))
rs = np.random.RandomState(1234 + pid)  # each process stages its own reals
for i in range(2):
    local = rs.rand(2 * half, *IMG).astype(np.float32)  # 2 local devices
    reals = jax.make_array_from_process_local_data(sharding, local)
    state, metrics = step(state, reals, jax.random.PRNGKey(i))
jax.block_until_ready(state)
assert int(state.step) == 2
assert np.isfinite(float(metrics.loss_d))

# replication invariant across this process's addressable devices
for leaf in jax.tree_util.tree_leaves(state.g_params):
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

print(f"PROC_OK pid={pid} loss_d={float(metrics.loss_d):.4f} "
      f"loss_g={float(metrics.loss_g):.4f}")
