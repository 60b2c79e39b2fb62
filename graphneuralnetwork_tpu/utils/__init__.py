from .debug import (  # noqa: F401
    assert_all_finite,
    debug_nans_enabled,
    find_nonfinite,
    nan_checked,
)
from .profiling import MetricLogger, StepTimer, trace  # noqa: F401
