"""Pallas TPU kernels for the hot flux paths."""

from .fused import (fused_flux_step, fused_ice_step, fused_mixed_step,
                    pallas_available)

__all__ = ["fused_flux_step", "fused_ice_step", "fused_mixed_step",
           "pallas_available"]
