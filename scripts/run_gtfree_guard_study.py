"""GT-free divergence detection study (VERDICT r4 item 7).

The round-4 guard study proved that photometric-consistent collapse (the
deterministic fused-f32 VS divergence: train EPE 5.4 -> 106.6 while the OVS
loss stays flat at ~0.218) is INVISIBLE to the OVS-loss and disparity-band
channels, and only the GT-supervised train-EPE channel contains it
(artifacts/paper_scale_r4/ANALYSIS.md). Before settling for a GT-dependent
guard, this study measures the obvious GT-FREE candidates on the SAME
deterministic collapse run (same seeds/data/threshold — finding 0: the
pipeline is bit-deterministic) and on the mild-drift faithful-VS comparator:

  grad_norm    stereo-net gradient norm of the Monodepth loss on a FIXED
               probe frame (is the optimizer being driven harder?)
  drift        relative parameter drift ||theta_t - theta_0|| / ||theta_0||
  lr_cons      left-right cross-consistency: mean |warp(d_r, d_l) - d_l|
               over the warp validity mask on the probe frame (a collapsed
               disparity field should break cross-view geometric agreement
               even while each view's photometric loss stays low)
  fcs          FCS of the probe frame (trajectory statistics)
  mean_disp    mean |d_l| (the round-4 channel, for reference)
  epe          probe-frame EPE vs synthetic GT — the LABEL for collapse
               onset (study-only; not available in deployment)

Probes run read-only at ring-drain boundaries (stream_driver probe_hook)
every `--probe_hz` steps in EVAL mode — they do not perturb the trajectory.

Usage (expects the phase-0..2 outputs of run_paper_scale_synth.py in
--work / --artifacts from the round-4 study):

  python scripts/run_gtfree_guard_study.py \
      --work /tmp/paper_scale_r4 --artifacts artifacts/paper_scale_r4 \
      --out artifacts/gtfree_study_r5
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--work", default="/tmp/paper_scale_r4")
    p.add_argument("--artifacts", default="artifacts/paper_scale_r4")
    p.add_argument("--out", default="artifacts/gtfree_study_r5")
    p.add_argument("--configs", nargs="*", default=["fused", "faithful"])
    p.add_argument("--adapt_steps", type=int, default=4000)
    p.add_argument("--probe_hz", type=int, default=25)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=960)
    return p.parse_args()


# Phase-3 configs of run_paper_scale_synth.py (must match for determinism).
CONFIGS = {
    "faithful": dict(fused=False, dtype="float32", mode="VS"),
    "fused": dict(fused=True, dtype="float32", mode="VS"),
    # Healthy comparator: VS+ER has never diverged in any round — the
    # baseline a GT-free channel must NOT flag.
    "vser": dict(fused=True, dtype="float32", mode="VS+ER"),
}


def main():
    a = parse_args()
    os.makedirs(a.out, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.data import StereoDataset
    from adaptive_stereo_tpu.engine import (
        AdaptConfig,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        OptimConfig,
    )
    from adaptive_stereo_tpu.engine.checkpoint import load_variables
    from adaptive_stereo_tpu.engine.stream_driver import adapt_streaming
    from adaptive_stereo_tpu.models import StereoModel
    from adaptive_stereo_tpu.ops import (
        feature_contrast_mean,
        linear_warp,
        monodepth_single_loss,
    )
    from adaptive_stereo_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    train_root = os.path.join(a.work, "train_domain")
    novel_root = os.path.join(a.work, "novel_domain")
    weights = os.path.join(a.work, "logs", "pretrain", "models",
                           "weights_final")
    with open(os.path.join(a.artifacts, "ood_threshold.json")) as f:
        threshold = json.load(f)["threshold"]
    print(f"[study] weights {weights}, threshold {threshold:.4f}", flush=True)
    variables = load_variables(weights)
    theta0 = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree.leaves(variables["params"])])
    theta0_norm = float(np.linalg.norm(theta0))

    # Fixed probe frame: stream frame 0 + GT.
    probe_ds = StereoDataset(novel_root, "Synthetic", "synth", a.height,
                             a.width, "train", scales=[0],
                             load_disp_left=True, load_disp_right=False)
    it = probe_ds[0]
    pl_ = jnp.asarray(it["color_l/0"])[None]
    pr_ = jnp.asarray(it["color_r/0"])[None]
    pgt = jnp.asarray(it["gt_disp_l/0"])[None]

    for cname in a.configs:
        copts = CONFIGS[cname]
        dtype = jnp.bfloat16 if copts["dtype"] == "bfloat16" else None
        model = StereoModel(k=4, input_scale=0, dtype=dtype,
                            fused_siamese=copts["fused"],
                            s2d_refinement=copts["fused"])
        max_disp_scaled = 192

        @jax.jit
        def probe(params, bn):
            v = {"params": params, "batch_stats": bn}
            flip = lambda x: x[:, :, ::-1, :]
            outs = model.apply(
                v, jnp.concatenate([pl_, flip(pr_)], 0),
                jnp.concatenate([pr_, flip(pl_)], 0), side="l",
                output_cost_volume=True, train=False)
            pred = outs["pred_disp_l/0"]
            d_l, d_r = pred[0:1], flip(pred[1:2])
            fm = feature_contrast_mean(outs["cost_volume_l/4"][0:1])
            fcs = jnp.mean(fm)
            # L-R cross-consistency: sample the right-view disparity at the
            # left-view matches; geometric agreement = |warped d_r - d_l|.
            warped, mask = linear_warp(d_r, d_l, max_disp=max_disp_scaled)
            lr_cons = (jnp.sum(jnp.abs(warped - d_l) * mask)
                       / jnp.maximum(jnp.sum(mask), 1.0))
            epe = jnp.mean(jnp.abs(d_l - pgt))
            mean_disp = jnp.mean(jnp.abs(d_l))

            def mono_of(p):
                o = model.apply({"params": p, "batch_stats": bn},
                                pl_, pr_, side="l", train=False)
                loss, _ = monodepth_single_loss(pl_, pr_, o["pred_disp_l/0"],
                                                1e-3,
                                                max_disp=max_disp_scaled)
                return loss

            mono, g = jax.value_and_grad(mono_of)(params)
            gs = g["stereo_net"]
            gnorm = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                                 for x in jax.tree.leaves(gs)))
            return fcs, lr_cons, epe, mean_disp, mono, gnorm

        rows = []

        def hook(step, get_vars):
            if step % a.probe_hz:
                return
            v = get_vars()
            out = [float(x) for x in probe(v["params"], v["batch_stats"])]
            theta = np.concatenate([np.asarray(x).ravel() for x in
                                    jax.tree.leaves(v["params"])])
            drift = float(np.linalg.norm(theta - theta0)) / theta0_norm
            rows.append([step] + out + [drift])
            if len(rows) % 20 == 1:
                print(f"[{cname}] step {step}: fcs={out[0]:.3f} "
                      f"lr_cons={out[1]:.3f} epe={out[2]:.2f} "
                      f"|d|={out[3]:.2f} mono={out[4]:.4f} "
                      f"gnorm={out[5]:.3f} drift={drift:.4f}", flush=True)

        cfg = ExperimentConfig(
            model_name=f"gtfree_{cname}", log_dir=os.path.join(a.work, "logs"),
            num_epochs=100, log_frequency=a.probe_hz, seed=123,
            log_images=False,
            model=ModelConfig(k=4, input_scale=0,
                              compute_dtype=copts["dtype"],
                              fused_siamese=copts["fused"],
                              s2d_refinement=copts["fused"]),
            optim=OptimConfig(learning_rate=5e-5, clip_grad_norm=True,
                              scheduler_step_size=10 ** 6),
            data=DataConfig(dataset_path=novel_root, dataset_name="Synthetic",
                            split="synth", height=a.height, width=a.width,
                            batch_size=1, num_workers=4),
            adapt=AdaptConfig(
                adapt_mode=copts["mode"], num_steps=a.adapt_steps,
                eval_hz=1000,
                ovs_buffer_size=16, ovs_validate_hz=200,
                val_improve_retries=2, er_loss_weight=0.05,
                ood_threshold=threshold, skip_initial_eval=True,
                train_dataset_path=train_root, train_dataset_name="Synthetic",
                train_split="synth"),
        )
        t0 = time.perf_counter()
        r = adapt_streaming(cfg, variables=variables, engine="flat",
                            fused_er_forward=copts["fused"],
                            device_cache=True, probe_hook=hook)
        dt = time.perf_counter() - t0
        arr = np.asarray(rows)
        out_csv = os.path.join(a.out, f"probes_{cname}.csv")
        np.savetxt(out_csv, arr, delimiter=",", fmt="%.6g",
                   header="step,fcs,lr_cons,epe,mean_disp,mono,grad_norm,drift",
                   comments="")
        fm = r["final_metrics"]
        print(f"[{cname}] done in {dt:.0f}s: final adapt EPE "
              f"{fm.get('adapt', {}).get('EPE', float('nan')):.2f} train EPE "
              f"{fm.get('train', {}).get('EPE', float('nan')):.2f} "
              f"updates {r['gradient_updates']} -> {out_csv}", flush=True)


if __name__ == "__main__":
    main()
