"""End-to-end slices on the synthetic dataset: supervised training, online
adaptation with every mode's gating behavior, checkpoint round-trip.

Small shapes keep CPU compile+run time bounded; the semantics exercised are
the full production paths (SURVEY.md §7 steps 4-6).
"""

import os

import numpy as np
import pytest

from adaptive_stereo_tpu.data import generate_synthetic_dataset
from adaptive_stereo_tpu.engine import (
    AdaptConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
)

H, W = 64, 96
K, S = 3, 1


# Heavy engine/kernel runs: the slow tier (see README 'Running the tests').
pytestmark = pytest.mark.slow


def _cfg(root, log_dir, name, **adapt_kw):
    return ExperimentConfig(
        model_name=name,
        log_dir=log_dir,
        num_epochs=1,
        log_frequency=10,
        seed=123,
        model=ModelConfig(k=K, input_scale=S),
        optim=OptimConfig(learning_rate=1e-4, scheduler_step_size=1000, clip_grad_norm=True),
        data=DataConfig(dataset_path=root, dataset_name="Synthetic", split="synth",
                        height=H, width=W, batch_size=2, num_workers=2),
        adapt=AdaptConfig(**adapt_kw),
    )


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    train_root = str(tmp_path_factory.mktemp("train_domain"))
    novel_root = str(tmp_path_factory.mktemp("novel_domain"))
    generate_synthetic_dataset(train_root, name="synth", num_train=8, num_val=2,
                               height=H, width=W, max_disp=16.0, seed=0)
    generate_synthetic_dataset(novel_root, name="synth", num_train=24, num_val=2,
                               height=H, width=W, max_disp=16.0, seed=50,
                               domain_shift=True)
    return train_root, novel_root


@pytest.fixture(scope="module")
def pretrained(roots, tmp_path_factory):
    """Briefly pretrain on the training domain; reused by adaptation tests."""
    from adaptive_stereo_tpu.engine import train

    train_root, _ = roots
    log_dir = str(tmp_path_factory.mktemp("logs_train"))
    cfg = _cfg(train_root, log_dir, "pretrain")
    cfg.num_epochs = 10
    cfg.save_freq = 100  # skip mid-run checkpoints
    cfg.fast_eval = False
    result = train(cfg)
    result["log_path"] = os.path.join(log_dir, "pretrain")
    state = result["state"]
    return {"params": state.params, "batch_stats": state.batch_stats}, result


def test_supervised_training_learns(pretrained, roots):
    variables, result = pretrained
    assert result["steps"] == 10 * 4  # 8 items / batch 2 = 4 steps x 10 epochs
    m = result["final_metrics"]
    assert np.isfinite(m["EPE"])
    # Untrained EPE on this data is ~10 px (soft-argmin of noise); 40 steps
    # must pull it down substantially.
    assert m["EPE"] < 5.5, m


def test_image_panels_and_provenance(pretrained):
    """TB event files carry colorized disparity/input image panels
    (reference train.py:44-71) and opt.json records the git SHA
    (reference train.py:149-160)."""
    import json

    variables, result = pretrained
    log_path = result["log_path"]

    with open(os.path.join(log_path, "opt.json")) as f:
        opt = json.load(f)
    assert "commit_hash" in opt and len(opt["commit_hash"]) >= 7, opt.get("commit_hash")

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(os.path.join(log_path, "val"),
                           size_guidance={"images": 0})
    acc.Reload()
    img_tags = acc.Tags().get("images", [])
    assert any("pred_disp" in t for t in img_tags), img_tags
    assert any("color_l" in t for t in img_tags), img_tags
    assert not any("cost_volume" in t for t in img_tags), img_tags


def test_checkpoint_roundtrip(pretrained, roots, tmp_path):
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import (
        create_train_state, load_checkpoint, save_checkpoint,
    )
    from adaptive_stereo_tpu.models import StereoModel

    variables, result = pretrained
    state = result["state"]
    folder = save_checkpoint(str(tmp_path), state, "t", {"note": "test"})
    assert os.path.exists(os.path.join(folder, "state.msgpack"))

    model = StereoModel(k=K, input_scale=S)
    dummy = jnp.zeros((1, H // 2 ** S, W // 2 ** S, 3), jnp.float32)
    fresh = create_train_state(model, jax.random.PRNGKey(0), dummy, dummy, 1e-4)
    restored = load_checkpoint(folder, fresh)
    same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)), restored.params, state.params)
    assert all(jax.tree.leaves(same))
    assert int(restored.step) == int(state.step)


def test_adapt_nonstop_reduces_monodepth_loss(pretrained, roots, tmp_path):
    """NONSTOP adaptation on the shifted domain must reduce the adaptation
    EPE relative to pre-adaptation (the core claim of the method)."""
    from adaptive_stereo_tpu.engine import adapt

    variables, _ = pretrained
    train_root, novel_root = roots
    cfg = _cfg(train_root, str(tmp_path), "adapt_nonstop",
               adapt_mode="NONSTOP", num_steps=20, eval_hz=20,
               ovs_validate_hz=1000, skip_initial_eval=False,
               train_dataset_path=train_root, train_dataset_name="Synthetic",
               train_split="synth")
    cfg.data.dataset_path = novel_root
    cfg.data.batch_size = 1
    cfg.optim.learning_rate = 3e-4

    result = adapt(cfg, variables=variables)
    assert result["gradient_updates"] == 20
    assert result["final_state"] == "IN_PROGRESS"

    import pandas as pd

    df = pd.read_csv(os.path.join(str(tmp_path), "adapt_nonstop", "trials.csv"))
    pre = df[df["step"] == -1].iloc[0]
    post = df[df["step"] == 20].iloc[0]
    assert post["EPE_ADAPT"] < pre["EPE_ADAPT"], (pre["EPE_ADAPT"], post["EPE_ADAPT"])


def test_adapt_vs_er_state_machine_and_gating(pretrained, roots, tmp_path):
    """VS+ER with an always-novel threshold: frames get diverted to the OVS
    (skipped updates), validation transitions run, replay loss is active."""
    from adaptive_stereo_tpu.engine import adapt

    variables, _ = pretrained
    train_root, novel_root = roots
    cfg = _cfg(train_root, str(tmp_path), "adapt_vs_er",
               adapt_mode="VS+ER", num_steps=16, eval_hz=16,
               ovs_buffer_size=4, ovs_validate_hz=6, val_improve_retries=2,
               ood_threshold=1e9,  # everything is "novel"
               train_dataset_path=train_root, train_dataset_name="Synthetic",
               train_split="synth", skip_initial_eval=True)
    cfg.data.dataset_path = novel_root
    cfg.data.batch_size = 1

    result = adapt(cfg, variables=variables)
    # The first 4 frames fill the OVS (updates skipped); later reservoir adds
    # skip more. Gradient updates must be strictly fewer than steps.
    assert 0 < result["gradient_updates"] < 16
    assert result["steps"] == 16


def test_adapt_mode_none_never_updates(pretrained, roots, tmp_path):
    from adaptive_stereo_tpu.engine import adapt

    variables, _ = pretrained
    train_root, novel_root = roots
    cfg = _cfg(train_root, str(tmp_path), "adapt_none",
               adapt_mode="NONE", num_steps=6, eval_hz=0,
               train_dataset_path=train_root, train_dataset_name="Synthetic",
               train_split="synth", skip_initial_eval=True)
    cfg.data.dataset_path = novel_root
    cfg.data.batch_size = 1

    result = adapt(cfg, variables=variables)
    assert result["gradient_updates"] == 0
    assert result["final_state"] == "DONE"


def test_adapt_vs_plateau_reaches_done_and_restarts(pretrained, roots, tmp_path):
    """VS with a plateauing stream: the state machine must transition to DONE
    (no further updates) and restart when a novel frame arrives while DONE
    (reference adapt.py:111-120, 144-166)."""
    import random as pyrandom

    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import (
        State,
        StateMachine,
        make_ovs_validate_step,
    )
    from adaptive_stereo_tpu.models import StereoModel

    variables, _ = pretrained
    model = StereoModel(k=K, input_scale=S)
    validate_fn = make_ovs_validate_step(model, S)
    hs, ws = H // 2 ** S, W // 2 ** S
    sm = StateMachine(State.IN_PROGRESS, ovs_buffer_size=2,
                      validate_fn=validate_fn, pad_shape=(hs, ws),
                      rng=pyrandom.Random(0))

    img = jnp.asarray(np.random.RandomState(1).rand(1, hs, ws, 3), jnp.float32)
    sm.add_to_ovs(img, img, 1.0, 0)
    sm.add_to_ovs(img, img, 1.0, 1)

    params, stats = variables["params"], variables["batch_stats"]
    # First validation records a baseline loss (buffer changed -> IN_PROGRESS).
    sm.validate(params, stats)
    assert sm.transition(val_improve_retries=1) == State.IN_PROGRESS
    # Weights unchanged -> identical loss, buffer unchanged -> DONE.
    sm.validate(params, stats)
    assert sm.transition(val_improve_retries=1) == State.DONE
    # Novel frame while DONE -> restart, even if the reservoir declines it.
    sm.add_to_ovs(img, img, 1.0, 0)  # duplicate index: not stored
    assert sm.state() == State.IN_PROGRESS


def test_adapt_splits_root_override_keeps_train_domain_resolution(
        pretrained, roots, tmp_path):
    """Regression: an explicit --splits_root must apply only to the ADAPT
    domain; the training-domain (replay) dataset resolves its own splits
    under its dataset root (found via CLI end-to-end verification)."""
    from adaptive_stereo_tpu.engine import adapt

    variables, _ = pretrained
    train_root, novel_root = roots
    cfg = _cfg(train_root, str(tmp_path), "adapt_splitsroot",
               adapt_mode="ER", num_steps=3, eval_hz=0,
               train_dataset_path=train_root, train_dataset_name="Synthetic",
               train_split="synth", skip_initial_eval=True)
    cfg.data.dataset_path = novel_root
    cfg.data.batch_size = 1

    result = adapt(cfg, variables=variables,
                   splits_root=os.path.join(novel_root, "splits"))
    assert result["gradient_updates"] == 3


def test_priority_queue_ovs_policy(pretrained, roots):
    """The PQ OVS policy keeps the worst-loss pairs and interoperates with
    validation/transition (framework-defined wiring of reference C11)."""
    import random as pyrandom

    import jax.numpy as jnp

    from adaptive_stereo_tpu.engine import State, StateMachine, make_ovs_validate_step
    from adaptive_stereo_tpu.models import StereoModel

    variables, _ = pretrained
    model = StereoModel(k=K, input_scale=S)
    validate_fn = make_ovs_validate_step(model, S)
    hs, ws = H // 2 ** S, W // 2 ** S
    sm = StateMachine(State.IN_PROGRESS, ovs_buffer_size=2,
                      validate_fn=validate_fn, pad_shape=(hs, ws),
                      rng=pyrandom.Random(0), ovs_policy="priority_queue")

    img = jnp.zeros((1, hs, ws, 3), jnp.float32)
    assert sm.add_to_ovs(img, img, 1.0, 0)
    assert sm.add_to_ovs(img, img, 5.0, 1)
    # Full: a WORSE (higher-loss) pair evicts the best; a better one is
    # rejected.
    assert sm.add_to_ovs(img, img, 9.0, 2)
    assert not sm.add_to_ovs(img * 0.5, img, 0.1, 3)
    values = sorted(item[0] for item in sm.ovs.buf)
    assert values == [5.0, 9.0]
    # Batched validation updates stored values and transition logic runs.
    sm.validate(variables["params"], variables["batch_stats"])
    assert sm.transition(val_improve_retries=1) in (State.IN_PROGRESS, State.DONE)


def test_priority_queue_policy_gradient_accounting(pretrained, roots, tmp_path):
    """Under ovs_policy='priority_queue' EVERY novel frame diverts from the
    gradient update — including frames the heap rejects — and the host
    GRADIENT_UPDATES counter reflects the device's masked-Adam decision
    (VERDICT r1 weak-item: the PQ mode's accounting must be explicit)."""
    from adaptive_stereo_tpu.engine import adapt

    variables, _ = pretrained
    train_root, novel_root = roots
    cfg = _cfg(train_root, str(tmp_path), "adapt_pq",
               adapt_mode="VS", num_steps=8, eval_hz=8,
               ovs_buffer_size=2, ovs_validate_hz=100,
               ood_threshold=1e9,  # every frame novel
               ovs_policy="priority_queue", skip_initial_eval=True)
    cfg.data.dataset_path = novel_root
    cfg.data.batch_size = 1

    result = adapt(cfg, variables=variables,
                   splits_root=os.path.join(novel_root, "splits"))
    # 8 novel frames, heap capacity 2: some adds are rejected after the first
    # two, but ALL 8 frames still skip their update under the PQ policy.
    assert result["gradient_updates"] == 0, result["gradient_updates"]


def test_adapt_leftright_consistency_mode(pretrained, roots, tmp_path):
    """The L-R consistency adaptation path (fixed intent of the reference's
    broken one): both views predicted via the flipped-batch trick,
    occlusion-masked photometric + consistency loss, FCS from the
    left-centered cost volume."""
    from adaptive_stereo_tpu.engine import adapt

    variables, _ = pretrained
    train_root, novel_root = roots
    cfg = _cfg(train_root, str(tmp_path), "adapt_lr",
               adapt_mode="NONSTOP", num_steps=6, eval_hz=6,
               leftright_consistency=True, skip_initial_eval=True,
               train_dataset_path=train_root, train_dataset_name="Synthetic",
               train_split="synth")
    cfg.data.dataset_path = novel_root
    cfg.data.batch_size = 1
    result = adapt(cfg, variables=variables)
    assert result["gradient_updates"] == 6
    assert np.isfinite(result["final_metrics"]["adapt"]["EPE"])


def test_adapt_reconstruction_gate(pretrained, roots, tmp_path):
    """gate='reconstruction' (graveyard adapt_vae.py baseline): an AE trained
    on the TRAIN domain scores the shifted domain's frames above the derived
    threshold, so they are flagged novel and diverted to the OVS — fewer
    gradient updates than steps — while a +inf threshold gates nothing."""
    import jax.numpy as jnp

    from adaptive_stereo_tpu.analysis.reconstruction_ood import (
        reconstruction_scores,
        train_autoencoder,
    )
    from adaptive_stereo_tpu.data import BatchLoader, StereoDataset
    from adaptive_stereo_tpu.engine import adapt

    variables, _ = pretrained
    train_root, novel_root = roots

    def loader(root, split_kind):
        ds = StereoDataset(root, "Synthetic", "synth", H, W, split_kind,
                           scales=[S, S + K], do_hflip=False, random_crop=False)
        return BatchLoader(ds, 2, shuffle=False, num_workers=0, seed=0)

    gate_model, gate_vars, _losses = train_autoencoder(
        loader(train_root, "train"), input_scale=S, num_steps=40,
        learning_rate=3e-4, latent_channels=8, stages=2, seed=7)

    train_scores = reconstruction_scores(gate_model, gate_vars,
                                         loader(train_root, "train"),
                                         input_scale=S)
    novel_scores = reconstruction_scores(gate_model, gate_vars,
                                         loader(novel_root, "train"),
                                         input_scale=S)
    # The domain shift must be visible to the reconstruction signal.
    assert novel_scores.mean() > train_scores.mean()
    threshold = float(0.5 * (train_scores.mean() + novel_scores.mean()))

    def run(name, thr):
        cfg = _cfg(train_root, str(tmp_path), name,
                   adapt_mode="VS", num_steps=12, eval_hz=0,
                   ovs_buffer_size=4, ovs_validate_hz=6, val_improve_retries=3,
                   gate="reconstruction", ood_threshold=thr,
                   skip_initial_eval=True,
                   train_dataset_path=train_root,
                   train_dataset_name="Synthetic", train_split="synth")
        cfg.data.dataset_path = novel_root
        cfg.data.batch_size = 1
        return adapt(cfg, variables=variables, gate_model=gate_model,
                     gate_variables=gate_vars, gate_kind="ae")

    gated = run("adapt_recon_gate", threshold)
    assert gated["steps"] == 12
    assert gated["gradient_updates"] < 12, gated

    ungated = run("adapt_recon_gate_inf", float("inf"))
    assert ungated["gradient_updates"] == 12, ungated
