"""Host -> device input pipeline: double-buffered time-record feed.

The reference processes the time axis strictly sequentially because of the
warm-layer state (SURVEY.md §5); the input files live on the host.  The
TPU-native pattern (BASELINE.json north star) is to overlap the host-side
read + device transfer of record t+1 with the flux computation of record
t — JAX dispatch is async, so issuing ``device_put`` for the next record
immediately after launching the current step gives the overlap for free;
a background thread deepens the prefetch when host decode is slow.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional

import jax
import numpy as np

__all__ = ["prefetch_to_device", "run_series_pipelined"]


def prefetch_to_device(records: Iterable[Dict[str, np.ndarray]],
                       buffer_size: int = 2,
                       sharding=None) -> Iterator[dict]:
    """Iterate over forcing records with asynchronous device placement.

    ``records`` yields dicts of host numpy arrays (one time record each).
    A daemon thread keeps up to ``buffer_size`` records in flight:
    ``jax.device_put`` is issued ahead of consumption so the H2D copy of
    record t+1 overlaps the compute of record t.  With ``sharding`` the
    transfer lands directly in the sharded layout (multi-chip feed).
    """
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    _END = object()

    # a sharding over a single device buys nothing and (on some remote
    # backends) sends compilation through a much slower SPMD path
    if sharding is not None and len(sharding.device_set) <= 1:
        sharding = None

    def put(x):
        # only grid-shaped fields get the grid sharding; scalars (e.g.
        # isecday_utc) are replicated
        if sharding is not None and np.ndim(x) >= len(sharding.spec):
            return jax.device_put(x, sharding)
        return jax.device_put(x)

    def producer():
        try:
            for rec in records:
                q.put({k: put(v) for k, v in rec.items()})
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item


def run_series_pipelined(cfg, records: Iterable[Dict[str, np.ndarray]],
                         skin_state=None, sharding=None,
                         isecday_key: str = "isecday_utc",
                         lon=None,
                         collect: Optional[Callable] = None):
    """Sequential time stepping with a double-buffered device feed.

    Unlike :func:`aerobulk_tpu.run_series` (whole series resident on
    device, ``lax.scan``), this streams records from the host — the right
    shape when the forcing does not fit in HBM (e.g. years of 0.25-degree
    global fields).  ``collect(out)`` maps each FluxOutput to what should
    be kept (default: QL/QH/Tau/Evap on host).

    Returns ``(list of collected outputs, final SkinState)``.
    """
    from .api import flux_step, init_skin_state

    if collect is None:
        def collect(out):
            return {"QL": np.asarray(out.QL), "QH": np.asarray(out.QH),
                    "Tau": np.asarray(out.Tau),
                    "Evap": np.asarray(out.Evap)}

    @jax.jit
    def step(rec, isd, state):
        out, new_state = flux_step(
            cfg, rec["sst"], rec["t_zt"], rec["hum_zt"], rec["U_zu"],
            rec["V_zu"], rec["slp"],
            rad_sw=rec.get("rad_sw"), rad_lw=rec.get("rad_lw"),
            isecday_utc=isd, lon=rec.get("lon", lon),
            skin_state=state)
        return out, new_state

    if sharding is not None and len(sharding.device_set) <= 1:
        sharding = None

    state = skin_state
    results = []
    for rec in prefetch_to_device(records, sharding=sharding):
        isd = rec.pop(isecday_key, 43200)
        if state is None:
            state = init_skin_state(cfg, rec["sst"].shape, rec["sst"].dtype)
            if sharding is not None:
                state = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sharding), state)
        out, state = step(rec, isd, state)
        results.append(collect(out))
    return results, state
