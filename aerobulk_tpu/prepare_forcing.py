"""Forcing-preparation utilities — the python/misc equivalents.

The reference ships data-prep scripts (``build_q2_from_d2_slp.py``,
``prepare_PAPA_forcing_aerobulk.py``, ``download_prepare_ERA5*.py``) that
convert raw reanalysis / mooring files to AeroBulk conventions.  This
module provides the conversion core as reusable functions (downloading is
out of scope in a zero-egress environment — point these at local files):

  * q2 from dew point + slp (the build_q2_from_d2_slp capability);
  * unit normalization (degC->K, hPa->Pa, accumulated J/m^2 -> W/m^2 for
    ERA5 radiation);
  * variable-name normalization to the aerobulk registry;
  * land/range masking with a fill value.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from . import constants as c
from . import io as abio

__all__ = ["q2_from_d2_slp", "normalize_units", "prepare_forcing_dict",
           "era5_accum_to_flux", "RMISS"]

RMISS = -9999.0   # reference scripts' fill value


def q2_from_d2_slp(d2: np.ndarray, slp: np.ndarray,
                   mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Specific humidity at 2 m from dew-point temperature and sea-level
    pressure (host-side numpy; same Goff formula as the compute core)."""
    d2 = np.asarray(d2, np.float64)
    slp = np.asarray(slp, np.float64)
    ta = np.maximum(d2, 180.0)
    ztmp = c.rt0 / ta
    es = 100.0 * (10.0 ** (
        10.79574 * (1 - ztmp) - 5.028 * np.log10(ta / c.rt0)
        + 1.50475e-4 * (1 - 10.0 ** (-8.2969 * (ta / c.rt0 - 1)))
        + 0.42873e-3 * (10.0 ** (4.76955 * (1 - ztmp)) - 1) + 0.78614))
    q2 = es * c.reps0 / np.maximum(slp - (1 - c.reps0) * es, 1.0)
    if mask is not None:
        q2 = np.where(np.asarray(mask) >= 0.5, q2, RMISS)
    return q2


def era5_accum_to_flux(x: np.ndarray, accum_seconds: float = 3600.0):
    """ERA5 ssrd/strd are accumulated J/m^2 over the step -> mean W/m^2."""
    return np.asarray(x, np.float64) / accum_seconds


def normalize_units(name: str, x: np.ndarray) -> np.ndarray:
    """Heuristic unit normalization matching the reference's TO_KELVIN_3D
    and hPa checks (mod_phymbl.f90:1826-1848 spirit)."""
    x = np.asarray(x, np.float64)
    m = np.nanmean(np.where(x == RMISS, np.nan, x))
    if name in ("sst", "t_air", "dp_air"):
        if -80.0 < m < 50.0:
            return x + c.rt0          # degC -> K
        return x
    if name == "slp":
        if 800.0 < m < 1100.0:
            return x * 100.0          # hPa -> Pa
        return x
    return x


def prepare_forcing_dict(path: str, names: Optional[dict] = None,
                         accum_radiation: Optional[float] = None
                         ) -> Dict[str, np.ndarray]:
    """Read a raw forcing file and return unit-normalized arrays under
    aerobulk-internal names, deriving q_air from dp_air when needed."""
    f = abio.read_forcing(path, names=names)
    out = {}
    for k, v in f.items():
        out[k] = normalize_units(k, v)
    if "q_air" not in out and "dp_air" in out and "slp" in out:
        out["q_air"] = q2_from_d2_slp(out["dp_air"], out["slp"])
    if accum_radiation:
        for k in ("rad_sw", "rad_lw"):
            if k in out:
                out[k] = era5_accum_to_flux(out[k], accum_radiation)
    return out
