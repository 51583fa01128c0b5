"""Worker process for the 2-process jax.distributed CPU smoke test
(tests/test_multihost.py). Not a test module itself.

Each process brings up jax.distributed against a localhost coordinator with
4 virtual CPU devices, builds the global 8-device 'data' mesh, feeds ONLY its
local_data_slice of a global batch, and runs a psum-mean over a shard_map —
the exact collective the fleet gradient combine uses. Process 0 writes the
reduced value for the parent to check.

Usage: python tests/multihost_worker.py <coord_addr> <num_procs> <proc_id> <out>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCAL_DEVICES = 4


def main():
    coord, nproc, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from adaptive_stereo_tpu.parallel import initialize_multihost

    initialize_multihost(coordinator_address=coord, num_processes=nproc,
                         process_id=pid)

    assert jax.process_count() == nproc, jax.process_count()
    n_global = nproc * LOCAL_DEVICES
    assert len(jax.devices()) == n_global, len(jax.devices())

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from adaptive_stereo_tpu.parallel import local_data_slice, make_mesh

    mesh = make_mesh(n_global)

    # Global batch: one scalar row per stream; each process feeds only its
    # local slice (host-sharded streams).
    global_rows = np.arange(n_global, dtype=np.float32).reshape(n_global, 1)
    local_rows = local_data_slice(jnp.asarray(global_rows), mesh)
    assert local_rows.shape[0] == LOCAL_DEVICES

    arrays = [
        jax.device_put(local_rows[i:i + 1], d)
        for i, d in enumerate(mesh.local_devices)
    ]
    sharding = NamedSharding(mesh, P("data"))
    global_arr = jax.make_array_from_single_device_arrays(
        (n_global, 1), sharding, arrays)

    @jax.jit
    def psum_mean(x):
        def f(xs):
            return jax.lax.pmean(xs, axis_name="data")

        return shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"))(x)

    reduced = psum_mean(global_arr)
    local_vals = [np.asarray(s.data).ravel()[0] for s in reduced.addressable_shards]
    expected = float(global_rows.mean())
    for v in local_vals:
        assert abs(v - expected) < 1e-6, (v, expected)

    if pid == 0:
        with open(out_path, "w") as f:
            f.write(f"{local_vals[0]}\n")
    print(f"[proc {pid}] psum-mean={local_vals[0]} over {n_global} devices OK")


if __name__ == "__main__":
    main()
