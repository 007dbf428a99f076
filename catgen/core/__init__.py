from catgen.core.module import (  # noqa: F401
    Module,
    Variables,
    merge_variables,
    param_count,
)
from catgen.core import initializers  # noqa: F401
