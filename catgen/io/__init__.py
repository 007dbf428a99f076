from catgen.io import checkpoint  # noqa: F401
from catgen.io.grids import save_grid, sanity_probe_images, to_grid  # noqa: F401
from catgen.io.metrics import MetricsLogger, confusion_summary  # noqa: F401
from catgen.io.activations import save_activation_grids  # noqa: F401
