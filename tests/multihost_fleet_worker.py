"""Worker for the cross-process FLEET STEP test (tests/test_multihost.py).

Runs the REAL fused fleet adaptation step (parallel/fleet.py
make_fused_fleet_step: per-stream fwd+bwd, device-side OOD gating, psum
gradient combine, masked Adam, shared BN stats) over a 3-step gated chain,
either:
  - as ONE process with 8 virtual CPU devices ("single"), or
  - as 2 processes x 4 devices under jax.distributed ("multi"), with each
    process feeding ONLY its host-local stream slices (local_data_slice)
    as true host-sharded global arrays.

Both modes write the final replicated params/batch_stats and the per-stream
aux rows this process owns; the parent asserts multi == single. This is the
code path between the virtual mesh and a real pod that nothing else
executes (VERDICT r4 item 4).

Usage:
  python tests/multihost_fleet_worker.py single <out.npz>
  python tests/multihost_fleet_worker.py multi <coord> <nproc> <pid> <out.npz>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K, S, H, W = 3, 1, 32, 64
N = 8
LOCAL_DEVICES = 4


def main():
    mode = sys.argv[1]
    if mode == "single":
        out_path = sys.argv[2]
        n_local = N
    else:
        coord, nproc, pid, out_path = (
            sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
        n_local = LOCAL_DEVICES

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.flatten_util import ravel_pytree

    from adaptive_stereo_tpu.engine import create_train_state
    from adaptive_stereo_tpu.models import StereoModel
    from adaptive_stereo_tpu.parallel import (
        data_sharding,
        init_fleet_fcs_ema,
        initialize_multihost,
        local_data_slice,
        make_fused_fleet_step,
        make_mesh,
    )

    if mode == "multi":
        initialize_multihost(coordinator_address=coord, num_processes=nproc,
                             process_id=pid)
        assert jax.process_count() == nproc
    assert len(jax.devices()) == N, len(jax.devices())

    mesh = make_mesh(N)
    shard = data_sharding(mesh)

    def to_global(global_np):
        """Feed only this process's local rows, as a host-sharded global
        Array (the real pod data path)."""
        garr = jnp.asarray(global_np)
        if mode == "single":
            return jax.device_put(garr, shard)
        local = np.asarray(local_data_slice(garr, mesh))
        try:
            return jax.make_array_from_process_local_data(shard, local)
        except AttributeError:  # older jax
            per = local.shape[0] // len(mesh.local_devices)
            arrays = [
                jax.device_put(local[i * per:(i + 1) * per], d)
                for i, d in enumerate(mesh.local_devices)
            ]
            return jax.make_array_from_single_device_arrays(
                global_np.shape, shard, arrays)

    def batch_n(seed):
        r = np.random.RandomState(seed)
        return {
            f"color_l/{S}": to_global(r.rand(N, H, W, 3).astype(np.float32)),
            f"color_r/{S}": to_global(r.rand(N, H, W, 3).astype(np.float32)),
            f"gt_disp_l/{S}": to_global(
                (r.rand(N, H, W, 1) * 8).astype(np.float32)),
        }

    model = StereoModel(k=K, input_scale=S)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), left, left, 1e-4)
    # Replicated inputs must be process-local host values in multi-process
    # mode (identical on every process); numpy leaves are auto-replicated.
    state = jax.tree.map(lambda x: np.asarray(x), state)

    fused = make_fused_fleet_step(model, mesh, S, K, use_er=True, use_vs=True,
                                  ood_threshold=1e9, clip_grad_norm=True)
    ema = tuple(to_global(np.asarray(e)) for e in init_fleet_fcs_ema(N))

    scenarios = [
        (1, 11, [False] * N, [True] * N),
        (2, 12, [i % 2 == 0 for i in range(N)], [True] * N),
        (3, 13, [False] * N, [i < N // 2 for i in range(N)]),
    ]
    aux_rows = {}
    for step_i, (bs, es, would, in_prog) in enumerate(scenarios):
        bn, en = batch_n(bs), batch_n(es)
        state, ema, aux = fused(
            state, ema, bn, en,
            to_global(np.asarray(would)), to_global(np.asarray(in_prog)))
        for key in ("fcs_raw", "do_update", "Monodepth/total_loss"):
            rows = []
            for sh in aux[key].addressable_shards:
                start = sh.index[0].start or 0
                rows.append((start, np.asarray(sh.data)))
            rows.sort()
            aux_rows[f"step{step_i}/{key}"] = np.concatenate(
                [v for _, v in rows])
            aux_rows[f"step{step_i}/{key}_idx"] = np.asarray(
                [s for s, _ in rows])

    params_flat, _ = ravel_pytree(jax.device_get(state.params))
    stats_flat, _ = ravel_pytree(jax.device_get(state.batch_stats))
    np.savez(out_path, params=np.asarray(params_flat),
             stats=np.asarray(stats_flat), **aux_rows)
    print(f"[{mode}{'' if mode == 'single' else ' proc ' + str(pid)}] "
          f"fleet chain done; |params|={np.linalg.norm(params_flat):.6f}")


if __name__ == "__main__":
    main()
