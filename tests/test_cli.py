"""CLI surface tests: reference-compatible flag parsing + evaluate tooling."""

import os

import numpy as np
import pytest

from adaptive_stereo_tpu.cli import build_parser, options_to_config


def test_flag_surface_matches_reference_names():
    """Every reference TrainOptions flag parses (train.py:246-301)."""
    argv = [
        "adapt",
        "--height", "320", "--width", "960", "--model_name", "exp",
        "--stereonet_input_scale", "0", "--stereonet_k", "4",
        "--dataset_path", "/d", "--dataset_name", "VirtualKitti",
        "--split", "virtual_kitti_01_adapt", "--batch_size", "1",
        "--do_hflip", "--no_shuffle", "--log_dir", "/logs",
        "--load_weights_folder", "/w", "--scheduler_step_size", "100000",
        "--num_workers", "2", "--num_epochs", "1", "--log_frequency", "20",
        "--save_freq", "1", "--fast_eval", "--learning_rate", "5e-5",
        "--clip_grad_norm", "--smoothness_weight", "0.001",
        "--consistency_weight", "0.001", "--num_steps", "4000",
        "--ovs_buffer_size", "8", "--skip_initial_eval",
        "--ovs_validate_hz", "20", "--adapt_mode", "VS+ER",
        "--val_improve_retries", "2", "--eval_hz", "100",
        "--er_loss_weight", "0.05", "--train_dataset_path", "/t",
        "--train_dataset_name", "SceneFlowFlying",
        "--train_split", "sceneflow_flying_er_1000",
        "--ood_threshold", "12.76", "--fcs_ema_weight", "0.999",
    ]
    opt = build_parser().parse_args(argv)
    cfg = options_to_config(opt)
    assert cfg.model.k == 4 and cfg.model.input_scale == 0
    assert cfg.optim.learning_rate == 5e-5 and cfg.optim.clip_grad_norm
    assert cfg.adapt.adapt_mode == "VS+ER" and cfg.adapt.num_steps == 4000
    assert cfg.adapt.ovs_buffer_size == 8 and cfg.adapt.ood_threshold == 12.76
    assert cfg.data.split == "virtual_kitti_01_adapt"
    # Round-trips through JSON.
    from adaptive_stereo_tpu.engine import ExperimentConfig

    assert ExperimentConfig.from_json(cfg.to_json()).to_json() == cfg.to_json()


@pytest.mark.slow
def test_cli_evaluate_save_and_playback(tmp_path):
    """evaluate subcommand: save + playback over a synthetic dataset with a
    native-format checkpoint."""
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.cli import main
    from adaptive_stereo_tpu.data import generate_synthetic_dataset
    from adaptive_stereo_tpu.engine import create_train_state, save_checkpoint
    from adaptive_stereo_tpu.models import StereoModel

    root = str(tmp_path / "data")
    generate_synthetic_dataset(root, name="synth", num_train=2, num_val=2,
                               height=64, width=96, max_disp=12.0, seed=1)

    model = StereoModel(k=3, input_scale=0)
    dummy = jnp.zeros((1, 64, 96, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), dummy, dummy, 1e-4)
    ckpt = save_checkpoint(str(tmp_path / "logs"), state, "t", {})

    common = [
        "--height", "64", "--width", "96", "--stereonet_k", "3",
        "--stereonet_input_scale", "0", "--dataset_path", root,
        "--dataset_name", "Synthetic", "--split", "synth",
        "--splits_root", os.path.join(root, "splits"),
        "--load_weights_folder", ckpt,
    ]
    out1 = str(tmp_path / "saved")
    assert main(["evaluate", "--mode", "save", "--output_folder", out1,
                 "--limit", "2"] + common) == 0
    saved = sorted(os.listdir(out1))
    assert len(saved) == 2 and saved[0].endswith("_pred_disp.npy")
    disp = np.load(os.path.join(out1, saved[0]))
    assert disp.shape == (64, 96)

    out2 = str(tmp_path / "playback")
    assert main(["evaluate", "--mode", "playback", "--output_folder", out2,
                 "--limit", "1"] + common) == 0
    assert os.path.exists(os.path.join(out2, "000000.png"))


def test_cli_evaluate_video_mode(tmp_path):
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.cli import main
    from adaptive_stereo_tpu.data import generate_synthetic_dataset
    from adaptive_stereo_tpu.engine import create_train_state, save_checkpoint
    from adaptive_stereo_tpu.models import StereoModel

    root = str(tmp_path / "data")
    generate_synthetic_dataset(root, name="synth", num_train=2, num_val=1,
                               height=64, width=96, max_disp=12.0, seed=2)
    model = StereoModel(k=3, input_scale=0)
    dummy = jnp.zeros((1, 64, 96, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), dummy, dummy, 1e-4)
    ckpt = save_checkpoint(str(tmp_path / "logs"), state, "t", {})

    out = str(tmp_path / "video")
    assert main(["evaluate", "--mode", "video", "--output_folder", out,
                 "--limit", "1", "--height", "64", "--width", "96",
                 "--stereonet_k", "3", "--stereonet_input_scale", "0",
                 "--dataset_path", root, "--dataset_name", "Synthetic",
                 "--split", "synth", "--splits_root", root + "/splits",
                 "--load_weights_folder", ckpt]) == 0
    assert os.path.exists(os.path.join(out, "frame_000000.png"))


def test_experiments_presets_construct():
    from adaptive_stereo_tpu.experiments import (
        ADAPTATION_ENVIRONMENTS,
        adaptation_config,
        training_config,
    )

    for env in ADAPTATION_ENVIRONMENTS:
        for method in ("nonstop", "vs", "er", "vs+er", "none"):
            cfg = adaptation_config(env, method, dataset_paths={},
                                    load_weights_folder="/w")
            assert cfg.adapt.num_steps == 4000
            assert cfg.model.k == 4 and cfg.data.height == 320
            assert cfg.adapt.ovs_buffer_size == 16
            # Only nonstop runs the pre-adaptation eval (reference
            # preprocess_adapt_results.py:44-46 convention).
            assert cfg.adapt.skip_initial_eval == (method != "nonstop")
    t = training_config("SceneFlowFlying", "/data/sf")
    assert t.data.do_hflip and t.optim.scheduler_step_size == 5


def test_cli_evaluate_eval_mode(tmp_path, capsys):
    """The 'eval' mode (a stub in the reference, evaluate_model.py:121-122)
    runs the full metrics contract and prints EPE/D1/FCS."""
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.cli import main
    from adaptive_stereo_tpu.data import generate_synthetic_dataset
    from adaptive_stereo_tpu.engine import create_train_state, save_checkpoint
    from adaptive_stereo_tpu.models import StereoModel

    root = str(tmp_path / "data")
    generate_synthetic_dataset(root, name="synth", num_train=2, num_val=2,
                               height=64, width=96, max_disp=12.0, seed=3)
    model = StereoModel(k=3, input_scale=0)
    dummy = jnp.zeros((1, 64, 96, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), dummy, dummy, 1e-4)
    ckpt = save_checkpoint(str(tmp_path / "logs"), state, "t", {})

    assert main(["evaluate", "--mode", "eval", "--height", "64", "--width", "96",
                 "--stereonet_k", "3", "--stereonet_input_scale", "0",
                 "--dataset_path", root, "--dataset_name", "Synthetic",
                 "--split", "synth", "--splits_root", root + "/splits",
                 "--load_weights_folder", ckpt, "--batch_size", "2"]) == 0
    out = capsys.readouterr().out
    assert "EPE=" in out and "D1_all_3px=" in out and "FCS=" in out


@pytest.mark.slow
def test_cli_adapt_streaming_engine(tmp_path):
    """`adapt --engine flat --done_batch 2` drives the zero-sync streaming
    engine (with DONE micro-batching) through the CLI end-to-end."""
    from adaptive_stereo_tpu.cli import main
    from adaptive_stereo_tpu.data import generate_synthetic_dataset
    from adaptive_stereo_tpu.engine import train
    from adaptive_stereo_tpu.engine.config import (
        DataConfig, ExperimentConfig, ModelConfig, OptimConfig)

    root = str(tmp_path / "data")
    generate_synthetic_dataset(root, name="synth", num_train=6, num_val=2,
                               height=64, width=96, max_disp=16.0, seed=0)
    cfg = ExperimentConfig(
        model_name="pre", log_dir=str(tmp_path / "logs"), num_epochs=1,
        log_frequency=1000, save_freq=100,
        model=ModelConfig(k=3, input_scale=1),
        optim=OptimConfig(learning_rate=1e-4, scheduler_step_size=1000),
        data=DataConfig(dataset_path=root, dataset_name="Synthetic",
                        split="synth", height=64, width=96, batch_size=2,
                        num_workers=2),
    )
    train(cfg)

    rc = main([
        "adapt",
        "--model_name", "stream_cli", "--log_dir", str(tmp_path / "logs"),
        "--dataset_path", root, "--dataset_name", "Synthetic",
        "--split", "synth", "--height", "64", "--width", "96",
        "--stereonet_k", "3", "--stereonet_input_scale", "1",
        "--batch_size", "1", "--learning_rate", "3e-4",
        "--adapt_mode", "NONE", "--num_steps", "6", "--eval_hz", "6",
        "--num_epochs", "1", "--log_frequency", "4", "--skip_initial_eval",
        "--engine", "flat", "--done_batch", "2",
        "--train_dataset_path", root, "--train_dataset_name", "Synthetic",
        "--train_split", "synth",
        "--load_weights_folder",
        str(tmp_path / "logs" / "pre" / "models" / "weights_0"),
    ])
    assert rc == 0
    import pandas as pd

    df = pd.read_csv(tmp_path / "logs" / "stream_cli" / "trials.csv")
    assert (df["GRADIENT_UPDATES"] == 0).all()  # NONE mode: pure inference
