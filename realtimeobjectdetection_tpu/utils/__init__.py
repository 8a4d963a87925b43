from .profiling import Timer, trace_to, timed  # noqa: F401
