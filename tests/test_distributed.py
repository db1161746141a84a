"""2-process jax.distributed exercise (VERDICT round-1 item 6).

Spawns two real OS processes, each owning 2 virtual CPU devices, that
initialize ``jax.distributed`` against a local coordinator, feed
host-local forcing slabs through
``sharding.global_from_host_local`` (jax.make_array_from_process_local_data)
and run one jit-compiled stateful sharded flux step over the global
4-device mesh.  The per-process shard checksums must add up to the QL sum
of an identical single-process run — proving the multi-host feed helper
and ``init_distributed`` produce the same numbers as the plain path.
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same global problem as tests/_distributed_worker.py, one process."""
    from aerobulk_tpu.api import AeroBulkConfig, flux_step, init_skin_state

    ny, nx = 8, 16
    rng = np.random.default_rng(2027)
    sst = 285.0 + 15.0 * rng.random((ny, nx))
    t = sst + rng.normal(0.0, 2.0, (ny, nx))
    q = 0.004 + 0.012 * rng.random((ny, nx))
    u = rng.normal(0.0, 6.0, (ny, nx))
    v = rng.normal(0.0, 6.0, (ny, nx))
    slp = 98000.0 + 4000.0 * rng.random((ny, nx))
    rsw = 500.0 * rng.random((ny, nx))
    rlw = 250.0 + 150.0 * rng.random((ny, nx))
    lon = 360.0 * rng.random((ny, nx))

    cfg = AeroBulkConfig(algo="coare3p6", zt=2.0, zu=10.0, niter=3,
                         use_skin=True)
    state = init_skin_state(cfg, (ny, nx), jnp.float64)
    out, _ = flux_step(cfg, *map(jnp.asarray, (sst, t, q, u, v, slp)),
                       rad_sw=jnp.asarray(rsw), rad_lw=jnp.asarray(rlw),
                       isecday_utc=43200, lon=jnp.asarray(lon),
                       skin_state=state)
    return float(np.asarray(out.QL).sum())


@pytest.mark.slow
def test_two_process_distributed_sharded_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + ":" + env.get("PYTHONPATH", "")
    worker = os.path.join(ROOT, "tests", "_distributed_worker.py")

    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=ROOT) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    sums = []
    for pid, out in enumerate(outs):
        line = next(ln for ln in out.splitlines()
                    if ln.startswith(f"WORKER {pid} OK"))
        sums.append(float(line.split()[-1]))

    ref = _single_process_reference()
    np.testing.assert_allclose(sums[0] + sums[1], ref, rtol=1e-12)
