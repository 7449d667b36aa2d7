"""Auxiliary subsystems: profiling/tracing, metrics, checkpointing —
the SURVEY §5 gaps the reference leaves open."""

from .profiling import BenchResult, annotate, benchmark, trace  # noqa: F401
from .metrics import MetricsLogger  # noqa: F401
from . import checkpoint  # noqa: F401
from . import export  # noqa: F401
from .elastic import (  # noqa: F401
    ElasticConfig,
    RestartBudgetExceeded,
    StateCorruption,
    resume_state,
    run_elastic,
)
