"""Multi-chip fleet tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptive_stereo_tpu.engine import (
    create_train_state,
    make_adapt_forward_backward,
)
from adaptive_stereo_tpu.models import StereoModel
from adaptive_stereo_tpu.parallel import (
    FleetStream,
    data_sharding,
    fleet_adapt,
    init_fleet_fcs_ema,
    make_fleet_apply_updates,
    make_fleet_fwd_bwd,
    make_fused_fleet_step,
    make_mesh,
)

K, S, H, W = 3, 1, 32, 64
N = 8


# Heavy engine/kernel runs: the slow tier (see README 'Running the tests').
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= N, "conftest must provide 8 CPU devices"
    model = StereoModel(k=K, input_scale=S)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), left, left, 1e-4)
    mesh = make_mesh(N)
    shard = data_sharding(mesh)

    def batch_n(seed):
        r = np.random.RandomState(seed)
        return {
            f"color_l/{S}": jax.device_put(jnp.asarray(r.rand(N, H, W, 3), jnp.float32), shard),
            f"color_r/{S}": jax.device_put(jnp.asarray(r.rand(N, H, W, 3), jnp.float32), shard),
            f"gt_disp_l/{S}": jax.device_put(jnp.asarray(r.rand(N, H, W, 1) * 8, jnp.float32), shard),
        }

    return model, state, mesh, batch_n


def test_fleet_fwd_bwd_matches_single_stream(setup):
    """Per-stream grads from the sharded vmapped step must equal running each
    stream alone."""
    model, state, mesh, batch_n = setup
    single = make_adapt_forward_backward(model, S, K, use_er=False)
    fleet = make_fleet_fwd_bwd(single, mesh)

    bn = batch_n(1)
    grads_n, stats_n, aux_n = fleet(state.params, state.batch_stats, bn, bn)
    assert np.asarray(aux_n["fcs_raw"]).shape == (N,)

    for i in (0, 3, 7):
        bi = {k_: jnp.asarray(np.asarray(v)[i : i + 1]) for k_, v in bn.items()}
        g, st_, aux = single(state.params, state.batch_stats, bi, bi)
        np.testing.assert_allclose(float(aux["fcs_raw"]),
                                   float(aux_n["fcs_raw"][i]), rtol=1e-5)
        ref_leaves = jax.tree.leaves(g)
        got_leaves = [np.asarray(x)[i] for x in jax.tree.leaves(grads_n)]
        for r, o in zip(ref_leaves, got_leaves):
            np.testing.assert_allclose(np.asarray(r), o, rtol=2e-4, atol=2e-6)


def test_fused_fleet_step_masks_streams(setup):
    model, state, mesh, batch_n = setup
    fused = make_fused_fleet_step(model, mesh, S, K, use_vs=True,
                                  ood_threshold=1e9, clip_grad_norm=True)
    bn = batch_n(2)
    ema = init_fleet_fcs_ema(N)
    would = jnp.asarray([True] * N)       # all novel + all would-add
    in_prog = jnp.asarray([True] * N)
    new_state, ema, aux = fused(state, ema, bn, bn, would, in_prog)
    # Everyone diverted to OVS -> no gradient update at all.
    assert not bool(np.asarray(aux["do_update"]).any())
    same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)), new_state.params, state.params)
    assert all(jax.tree.leaves(same))

    # Half the streams update -> params move.
    would2 = jnp.asarray([i % 2 == 0 for i in range(N)])
    s2, ema2, aux2 = fused(state, init_fleet_fcs_ema(N), bn, bn, would2, in_prog)
    assert int(np.asarray(aux2["do_update"]).sum()) == N // 2
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), s2.params, state.params)
    assert max(jax.tree.leaves(moved)) > 0


def test_fused_fleet_step_equals_weighted_per_stream_grads(setup):
    """The fused step differentiates the gate-weighted SUM of per-stream
    losses in one backward (parallel/fleet.py — the formulation XLA compiles
    2.1x faster than vmap-of-grad on TPU). Certify it is numerically the
    do_update-weighted MEAN of per-stream grads: reproduce the update with
    make_fleet_fwd_bwd per-stream grads + a hand-built masked Adam apply."""
    import optax

    from adaptive_stereo_tpu.engine.steps import clip_stereo_net_grads

    model, state, mesh, batch_n = setup
    fused = make_fused_fleet_step(model, mesh, S, K, use_er=True, use_vs=True,
                                  ood_threshold=1e9, clip_grad_norm=True)
    bn, en = batch_n(11), batch_n(12)
    # Streams 0,2,4,6 divert their (novel) frame to the OVS -> masked out;
    # odd streams update.
    would = jnp.asarray([i % 2 == 0 for i in range(N)])
    in_prog = jnp.asarray([True] * N)
    new_state, _, aux = fused(state, init_fleet_fcs_ema(N), bn, en, would, in_prog)
    np.testing.assert_array_equal(np.asarray(aux["do_update"]),
                                  ~np.asarray(would))

    single = make_adapt_forward_backward(model, S, K, use_er=True)
    grads_n, _, _ = make_fleet_fwd_bwd(single, mesh)(
        state.params, state.batch_stats, bn, en)
    w = (~np.asarray(would)).astype(np.float32)
    wmean = jax.tree.map(
        lambda g: jnp.tensordot(jnp.asarray(w), g, axes=(0, 0)) / w.sum(), grads_n)
    ref_grads = clip_stereo_net_grads(wmean)
    updates, _ = state.tx.update(ref_grads, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)
    for got, ref in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-6)


def test_fused_fleet_step_shared_bn_mode(setup):
    """bn_mode='shared' (merged-batch forward, joint BN statistics — the
    documented fleet-serving deviation that avoids the per-stream vmap's
    stream-split<->merged layout conversions, artifacts/profile_fleet_r4.log):

    - at ONE stream the merged batch IS the per-stream batch, so shared and
      per_stream modes must agree exactly;
    - at N streams the gate/masking semantics are unchanged: per-stream aux
      vectors, diverted streams excluded from the update, no-active-streams
      leaves params untouched."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from adaptive_stereo_tpu.parallel import make_mesh

    model, state, mesh, batch_n = setup

    # N=1 equivalence on a single-device mesh.
    mesh1 = make_mesh(1)
    bn_full, en_full = batch_n(21), batch_n(22)
    # Re-materialize single-stream slices as plain host arrays — the module
    # fixture's batches are sharded over the 8-device mesh.
    b1 = {key: jnp.asarray(np.asarray(v[:1])) for key, v in bn_full.items()}
    e1 = {key: jnp.asarray(np.asarray(v[:1])) for key, v in en_full.items()}
    ema1 = init_fleet_fcs_ema(1)
    would1 = jnp.asarray([False])
    prog1 = jnp.asarray([True])
    outs = {}
    for mode in ("per_stream", "shared"):
        fused1 = make_fused_fleet_step(model, mesh1, S, K, use_er=True,
                                       use_vs=True, ood_threshold=1e9,
                                       clip_grad_norm=True, bn_mode=mode)
        st, ema_o, aux = fused1(state, ema1, b1, e1, would1, prog1)
        outs[mode] = (st, aux)
    # Forward-level equality: losses/FCS/EPE agree to f32 ulp noise. (The
    # post-Adam params are NOT compared: near-zero gradients update by
    # ~±lr*sign(g), so single-ulp contraction-order differences between the
    # vmapped and merged forward flip signs on tiny weights — the same
    # amplification quantified in tests/test_lockstep_reference.py.)
    for key in ("Monodepth/total_loss", "Replay/total_loss", "fcs_raw", "EPE"):
        np.testing.assert_allclose(
            np.asarray(outs["per_stream"][1][key]),
            np.asarray(outs["shared"][1][key]), rtol=1e-5,
            err_msg=key)
    assert bool(outs["per_stream"][1]["do_update"][0]) == \
        bool(outs["shared"][1]["do_update"][0])

    # N-stream semantics: shapes, masking, no-active-stream no-op.
    fused = make_fused_fleet_step(model, mesh, S, K, use_er=True, use_vs=True,
                                  ood_threshold=1e9, clip_grad_norm=True,
                                  bn_mode="shared")
    bn, en = batch_n(23), batch_n(24)
    would = jnp.asarray([i % 2 == 0 for i in range(N)])
    in_prog = jnp.asarray([True] * N)
    st, ema_o, aux = fused(state, init_fleet_fcs_ema(N), bn, en, would, in_prog)
    assert aux["Monodepth/total_loss"].shape == (N,)
    assert aux["fcs_raw"].shape == (N,)
    np.testing.assert_array_equal(np.asarray(aux["do_update"]),
                                  ~np.asarray(would))
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), st.params, state.params)))
    assert moved > 0
    # All streams DONE: params and opt state must not move.
    st2, _, aux2 = fused(state, init_fleet_fcs_ema(N), bn, en,
                         jnp.asarray([False] * N), jnp.asarray([False] * N))
    assert not bool(np.asarray(aux2["do_update"]).any())
    for a, b in zip(jax.tree.leaves(st2.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fleet_adapt_driver_runs(setup):
    """End-to-end fleet driver on 8 synthetic in-memory streams."""
    model, state, mesh, batch_n = setup

    class TinyDataset:
        def __init__(self, seed):
            self.r = np.random.RandomState(seed)
            self.items = [
                {
                    f"color_l/{S}": self.r.rand(H, W, 3).astype(np.float32),
                    f"color_r/{S}": self.r.rand(H, W, 3).astype(np.float32),
                    f"gt_disp_l/{S}": (self.r.rand(H, W, 1) * 8).astype(np.float32),
                }
                for _ in range(4)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    streams = [FleetStream(dataset=TinyDataset(i), name=f"cam{i}") for i in range(N)]
    result = fleet_adapt(
        model, state, streams, S, K, num_steps=4,
        ood_threshold=1e9,  # everything novel -> exercises gating paths
        adapt_mode="VS", ovs_buffer_size=2, ovs_validate_hz=3,
        mesh=mesh,
    )
    assert len(result["streams"]) == N
    for summary in result["streams"]:
        assert summary["steps"] == 4
        assert summary["ovs_size"] > 0
        # First frames diverted to OVS; later reservoir rejections update.
        assert summary["gradient_updates"] < 4


def test_parallel_train_step_matches_single_device(setup):
    """8-way data-parallel supervised step == single-device step on the same
    global batch. With BN frozen on running stats (train_bn=False) there is
    no cross-sample coupling, so the psum-mean of per-device grads equals the
    single-device global-batch grad EXACTLY — post-Adam params must agree to
    float32 tolerance. (Under train-mode BN the two differ by design: local
    batch-1 stats vs global batch-8 stats; we pin the loss agreement there.)"""
    from adaptive_stereo_tpu.engine import create_train_state, make_train_step
    from adaptive_stereo_tpu.parallel import data_sharding, make_parallel_train_step

    model, _, mesh, batch_n = setup
    rng = np.random.RandomState(7)
    left = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    state_a = create_train_state(model, jax.random.PRNGKey(1), left, left, 1e-4)
    state_b = create_train_state(model, jax.random.PRNGKey(1), left, left, 1e-4)

    gb = {
        f"color_l/{S}": rng.rand(N, H, W, 3).astype(np.float32),
        f"color_r/{S}": rng.rand(N, H, W, 3).astype(np.float32),
        f"gt_disp_l/{S}": (rng.rand(N, H, W, 1) * 8).astype(np.float32),
    }
    shard = data_sharding(mesh)
    sharded_batch = {k_: jax.device_put(jnp.asarray(v), shard) for k_, v in gb.items()}

    # --- exact invariant: eval-mode BN on both sides. SGD(1.0) makes the
    # post-step delta EQUAL the gradient, so this compares grads directly
    # (Adam's step-1 sign(g) normalization would amplify fp-noise-level
    # gradients into full-step sign flips). The reference decomposition is
    # the mean of per-sample grads — mathematically identical to the psum
    # mean. (The single-device GLOBAL-batch conv wgrad is NOT bit-comparable:
    # per-sample grad contributions through the softmax/cost-volume paths are
    # ~50-100x larger than their mean, so the conv's internal f32 accumulation
    # order shifts the result by ~1e-3 — measured, cancellation noise, not a
    # semantic difference. We pin the loss against the global step instead.)
    import optax
    sgd = optax.sgd(1.0)
    state_a = state_a.replace(tx=sgd, opt_state=sgd.init(state_a.params))
    pstep = make_parallel_train_step(model, sgd, mesh, S, [S, S + K],
                                     clip_grad_norm=False, train_bn=False)
    init_params = jax.tree.map(lambda x: x, state_a.params)
    state_a, losses_p = pstep(state_a, sharded_batch)

    sstep = make_train_step(model, sgd, S, [S, S + K],
                            clip_grad_norm=False, train_bn=False)
    per_sample_deltas = []
    for i in range(N):
        st = state_b.replace(tx=sgd, opt_state=sgd.init(state_b.params))
        st, losses_i = sstep(st, {k_: jnp.asarray(v[i : i + 1]) for k_, v in gb.items()})
        per_sample_deltas.append(jax.tree.map(lambda a, b: a - b, st.params, init_params))
    mean_delta = jax.tree.map(lambda *x: sum(x) / N, *per_sample_deltas)

    # psum-mean per-device grads == mean of per-sample grads, EXACTLY
    # (identical per-sample computations; only the 8-term reduction order
    # differs -> f32 round-off scaled by the per-sample grad magnitude).
    gmax = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(mean_delta))
    for pa, pi, pd in zip(jax.tree.leaves(state_a.params),
                          jax.tree.leaves(init_params),
                          jax.tree.leaves(mean_delta)):
        np.testing.assert_allclose(np.asarray(pa - pi), np.asarray(pd),
                                   rtol=1e-5, atol=2e-6 * max(1.0, gmax))

    # Loss: psum-mean of per-device losses == single-device global-batch loss.
    st_g = state_b.replace(tx=sgd, opt_state=sgd.init(state_b.params))
    _, losses_g = sstep(st_g, {k_: jnp.asarray(v) for k_, v in gb.items()})
    np.testing.assert_allclose(float(losses_p["total_loss"]),
                               float(losses_g["total_loss"]), rtol=1e-6)
    # batch_stats untouched in eval mode.
    for sa, sb in zip(jax.tree.leaves(state_a.batch_stats), jax.tree.leaves(state_b.batch_stats)):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))

    # --- train-mode BN: losses agree (pre-update, same params/stats) even
    # though normalization batches differ (1/device vs 8 global).
    state_c = create_train_state(model, jax.random.PRNGKey(1), left, left, 1e-4)
    state_d = create_train_state(model, jax.random.PRNGKey(1), left, left, 1e-4)
    pstep_t = make_parallel_train_step(model, state_c.tx, mesh, S, [S, S + K],
                                       clip_grad_norm=False)
    _, losses_pt = pstep_t(state_c, sharded_batch)
    sstep_t = make_train_step(model, state_d.tx, S, [S, S + K], clip_grad_norm=False)
    _, losses_st = sstep_t(state_d, {k_: jnp.asarray(v) for k_, v in gb.items()})
    lp, ls = float(losses_pt["total_loss"]), float(losses_st["total_loss"])
    assert abs(lp - ls) / ls < 0.05, (lp, ls)


def test_fleet_adapt_improves_shared_model(setup):
    """Fleet adaptation must actually LEARN: 4 streams of a shifted domain
    adapting a pretrained shared model reduce the Monodepth loss."""
    from adaptive_stereo_tpu.data import generate_synthetic_dataset, StereoDataset
    from adaptive_stereo_tpu.engine import create_train_state, make_infer_step, train
    from adaptive_stereo_tpu.engine import (
        AdaptConfig, DataConfig, ExperimentConfig, ModelConfig, OptimConfig,
    )
    import tempfile

    model, _, mesh, _ = setup
    work = tempfile.mkdtemp()
    generate_synthetic_dataset(f"{work}/train", name="synth", num_train=6,
                               num_val=2, height=H * 2, width=W * 2,
                               max_disp=12.0, seed=10)
    generate_synthetic_dataset(f"{work}/novel", name="synth", num_train=16,
                               num_val=2, height=H * 2, width=W * 2,
                               max_disp=12.0, seed=60, domain_shift=True)

    cfg = ExperimentConfig(
        model_name="fleet_pre", log_dir=f"{work}/logs", num_epochs=6,
        log_frequency=1000, save_freq=100,
        model=ModelConfig(k=K, input_scale=S),
        optim=OptimConfig(learning_rate=1e-4, scheduler_step_size=1000),
        data=DataConfig(dataset_path=f"{work}/train", dataset_name="Synthetic",
                        split="synth", height=H * 2, width=W * 2, batch_size=2,
                        num_workers=2))
    state = train(cfg)["state"]

    novel = StereoDataset(f"{work}/novel", "Synthetic", "synth", H * 2, W * 2,
                          "train", scales=[S])
    streams = [FleetStream(dataset=novel, name=f"cam{i}") for i in range(4)]

    # Pre-adaptation Monodepth loss on one novel frame.
    infer = make_infer_step(model, S, K)
    item = novel[0]
    batch = {k_: jnp.asarray(v)[None] for k_, v in item.items()}
    aux0, _ = infer(state.params, state.batch_stats, batch)

    result = fleet_adapt(model, state, streams, S, K, num_steps=5,
                         adapt_mode="NONSTOP", mesh=make_mesh(4),
                         clip_grad_norm=True)
    s1 = result["state"]
    aux1, _ = infer(s1.params, s1.batch_stats, batch)
    l0, l1 = float(aux0["Monodepth/total_loss"]), float(aux1["Monodepth/total_loss"])
    assert l1 < l0, (l0, l1)
    assert all(st["gradient_updates"] == 5 for st in result["streams"])
