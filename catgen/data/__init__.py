from catgen.data import color  # noqa: F401
from catgen.data import ops  # noqa: F401
from catgen.data.fixture import make_fixture_images, write_fixture_dataset  # noqa: F401
from catgen.data.loader import ImageDataset, scan_paths  # noqa: F401
from catgen.data.ops import AugmentConfig, augment_batch, downscale2, resize_bilinear  # noqa: F401
