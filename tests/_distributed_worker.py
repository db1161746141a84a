"""Worker process for the 2-process jax.distributed CPU test.

Spawned by tests/test_distributed.py as:
    python tests/_distributed_worker.py <coordinator> <nproc> <pid>

Each process owns 2 virtual CPU devices (4 global), initializes
jax.distributed, builds a global (1, 4) grid mesh, feeds its OWN
host-local slab of the forcing through
``sharding.global_from_host_local`` (jax.make_array_from_process_local_data),
runs one jit-compiled stateful COARE3.6+skin flux step sharded over the
global mesh, and prints a checksum of its addressable output shards.
The parent asserts both processes succeed and agree with a single-process
run of the same global problem.
"""

import os
import sys

# exactly 2 local virtual CPU devices per process (before any jax import);
# strip any inherited device-count flag (the pytest parent sets 8)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=2"])

import jax  # noqa: E402

# the container's sitecustomize force-registers the axon TPU backend; the
# platform choice must be overridden in-process before any backend is used
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from aerobulk_tpu.sharding import (global_from_host_local,
                                       init_distributed, make_grid_mesh)

    init_distributed(coordinator_address=coordinator, num_processes=nproc,
                     process_id=pid)

    assert jax.process_count() == nproc, jax.process_count()
    devs = jax.devices()
    assert len(devs) == 2 * nproc, devs      # global device view

    import jax.numpy as jnp
    from aerobulk_tpu.api import AeroBulkConfig, flux_step, init_skin_state
    

    mesh = make_grid_mesh(devs, shape=(1, len(devs)))

    # global problem: (8, 16) grid split over gx=4 -> each device owns
    # (8, 4); this process owns the two columns of its two local devices.
    ny, nx = 8, 16
    nx_local = nx // nproc
    x0 = pid * nx_local

    rng = np.random.default_rng(2027)        # same seed on every process
    sst_g = 285.0 + 15.0 * rng.random((ny, nx))
    t_g = sst_g + rng.normal(0.0, 2.0, (ny, nx))
    q_g = 0.004 + 0.012 * rng.random((ny, nx))
    u_g = rng.normal(0.0, 6.0, (ny, nx))
    v_g = rng.normal(0.0, 6.0, (ny, nx))
    slp_g = 98000.0 + 4000.0 * rng.random((ny, nx))
    rsw_g = 500.0 * rng.random((ny, nx))
    rlw_g = 250.0 + 150.0 * rng.random((ny, nx))
    lon_g = 360.0 * rng.random((ny, nx))

    # each process feeds ONLY its local slab (the multi-host IO pattern)
    local = [a[:, x0:x0 + nx_local] for a in
             (sst_g, t_g, q_g, u_g, v_g, slp_g, rsw_g, rlw_g, lon_g)]
    args = global_from_host_local(mesh, tuple(local))

    cfg = AeroBulkConfig(algo="coare3p6", zt=2.0, zu=10.0, niter=3,
                         use_skin=True)
    state = init_skin_state(cfg, (ny, nx_local), jnp.float64)
    state = global_from_host_local(mesh, state)

    @jax.jit
    def step(a, st):
        out, ns = flux_step(cfg, *a[:6], rad_sw=a[6], rad_lw=a[7],
                            isecday_utc=43200, lon=a[8], skin_state=st)
        return out.QL, out.QH, out.Tau, ns

    ql, qh, tau, ns = step(args, state)
    jax.block_until_ready((ql, qh, tau))

    # checksum over THIS process's addressable shards (order by x offset)
    shards = sorted(ql.addressable_shards, key=lambda s: s.index[1].start)
    local_ql = np.concatenate([np.asarray(s.data) for s in shards], axis=1)
    assert np.all(np.isfinite(local_ql))
    print(f"WORKER {pid} OK {local_ql.sum():.12e}", flush=True)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
