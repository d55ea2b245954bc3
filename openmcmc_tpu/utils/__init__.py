"""Utilities: profiling and debugging helpers."""

from openmcmc_tpu.utils.profiling import profile_run, trace_annotated

__all__ = ["profile_run", "trace_annotated"]
