from catgen.core.module import (  # noqa: F401
    Module,
    apply_with_intermediates,
    Variables,
    merge_variables,
    param_count,
)
from catgen.core import initializers  # noqa: F401
