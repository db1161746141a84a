"""Pallas TPU kernels for the hot flux paths."""

from .fused import (fused_bulk_step, fused_flux_step, fused_ice_step,
                    fused_mixed_step, pallas_available)

__all__ = ["fused_bulk_step", "fused_flux_step", "fused_ice_step",
           "fused_mixed_step", "pallas_available"]
