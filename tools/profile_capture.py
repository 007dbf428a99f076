"""jax.profiler trace capture around a train step (SURVEY.md §5.1: the
reference only prints epoch wall-clock; this is the op-level tracer).

    python tools/profile_capture.py --bs 256 --steps 5 --out /tmp/catgen_trace

View with TensorBoard or Perfetto (trace.json.gz inside the output dir).
Note: through the axon tunnel the device-side trace may be unavailable;
the host-side trace and HLO metadata still capture.
"""

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from catgen import models  # noqa: E402
from catgen.train import gan  # noqa: E402

IMG = (32, 32, 3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=256)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--out", default="/tmp/catgen_trace")
    args = p.parse_args()

    config = gan.GanConfig(batch_size=args.bs, noise_dim=100,
                           acc_window=20, compute_dtype=jnp.bfloat16)
    g = models.create_G_decoder_upsampling32c(IMG, 100)
    d = models.create_D32_st3(IMG)
    state = gan.init_state(g, d, config, jax.random.PRNGKey(0), IMG)
    step = jax.jit(gan.make_train_step(g, d, config))
    reals = jnp.asarray(np.random.RandomState(0).rand(
        args.bs // 2, *IMG).astype(np.float32))

    # warm up / compile outside the trace
    state, m = step(state, reals, jax.random.PRNGKey(0))
    float(m.loss_d)

    try:
        with jax.profiler.trace(args.out):
            for i in range(args.steps):
                state, m = step(state, reals, jax.random.PRNGKey(1 + i))
            float(m.loss_d)  # fetch-sync inside the trace window
        print(f"trace written to {args.out}")
    except Exception as e:  # tunnel may not support device tracing
        print(f"profiler capture unavailable here: {e}")


if __name__ == "__main__":
    main()
