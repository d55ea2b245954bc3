"""Fused whole-model sampling engines (the "fused attention" pattern for samplers)."""

from openmcmc_tpu.fused.gmrf_smoother import run_fused_smoother
from openmcmc_tpu.fused.linreg import run_fused_linreg
from openmcmc_tpu.fused.mixture import run_fused_mixture
from openmcmc_tpu.fused.mmala import run_fused_mmala
from openmcmc_tpu.fused.random_walk import run_fused_rw
from openmcmc_tpu.fused.rj import run_fused_rj
from openmcmc_tpu.fused.spectral import (
    run_spectral_linreg,
    run_spectral_mmala,
    run_spectral_smoother,
)

__all__ = [
    "run_fused_smoother",
    "run_fused_linreg",
    "run_fused_rw",
    "run_fused_mmala",
    "run_fused_mixture",
    "run_fused_rj",
    "run_spectral_linreg",
    "run_spectral_mmala",
    "run_spectral_smoother",
]
