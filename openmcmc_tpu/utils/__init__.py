"""Utilities: profiling, tracing and numerical debugging helpers."""

from openmcmc_tpu.utils.debugging import check_result, nan_debug
from openmcmc_tpu.utils.profiling import profile_run, trace_annotated

__all__ = ["profile_run", "trace_annotated", "check_result", "nan_debug"]
