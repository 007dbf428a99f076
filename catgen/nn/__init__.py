from catgen.nn.layers import (  # noqa: F401
    AvgPool,
    BatchNorm,
    Conv,
    Dense,
    Dropout,
    Flatten,
    LeakyReLU,
    MaxPool,
    PReLU,
    Reshape,
    Sigmoid,
    Softmax,
    SpatialDropout,
    SubPixelConv,
    Tanh,
    UnPooling,
    UpsampleNearest,
)
from catgen.nn.spatial_transformer import (  # noqa: F401
    SpatialTransformer,
    affine_grid,
    affine_matrix,
    bilinear_sample,
    warp_flow,
)
from catgen.kernels.upsample_conv import UpsampleConv  # noqa: F401
from catgen.core.module import (  # noqa: F401
    ConcatBranches,
    Lambda,
    Module,
    Sequential,
)
