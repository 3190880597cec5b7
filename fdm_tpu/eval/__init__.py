from fdm_tpu.eval.correlation import (  # noqa: F401
    correlation_report,
    temporal_corr,
)
from fdm_tpu.eval.metrics import (  # noqa: F401
    MetricAccumulator,
    diversity,
    fdd,
    mean_vertex_error,
    region_motion_std,
    region_vertex_error,
)
