"""catgen — a TPU-native (JAX / XLA / Pallas / pjit) generative-adversarial framework.

Re-implements the full capability surface of the Torch7 ``aleju/cat-generator``
reference (see SURVEY.md) as an idiomatic JAX framework: functional pytree
modules, a single jitted two-optimizer GAN train step with the reference's
training-dynamics guards (D accuracy gate, elementwise gradient clamps, L1/L2)
carried as state, custom Pallas kernels for the hot ops (fused
nearest-upsample+conv, bilinear spatial-transformer sampling), on-device data
augmentation, and data-parallel sharding over a TPU mesh.
"""

__version__ = "0.1.0"

from catgen.core import module as module  # noqa: F401
from catgen.core import initializers as initializers  # noqa: F401
