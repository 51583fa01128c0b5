"""Fused coarse-head kernel vs XLA at serving shapes on real TPU.

VERDICT r2 item 5: fuse the whole coarse head (cost-volume build + 5-layer
aggregation + softmax/soft-argmin/FCS) into one VMEM-resident kernel and
measure against XLA at serving shapes; keep it only on a >=15-20% win.

Three contenders at the paper coarse shape (D=12, 20x60 features, C=32):
  xla     — jit(coarse_head_ref): XLA-composed build + conv stack + epilogue
  semi    — XLA build + the round-2 fused aggregation kernel + XLA epilogue
  fused   — coarse_head_pallas: everything in one pallas_call

Parity is asserted first (same tolerance regime as exp_agg_eval.py), then
timing in eval mode (serving: B=1; batched DONE path: B=2/B=4) and train
mode B=1/B=2 (streaming forward).

Run: timeout 3000 python scripts/exp_coarse_head.py   (TPU; single process)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from adaptive_stereo_tpu.utils.compile_cache import enable_persistent_cache


def timeit(fn, *args, n=50):
    import jax

    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n)
    return 1e3 * float(np.min(ts))


def main():
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from adaptive_stereo_tpu.ops import (
        difference_cost_volume,
        feature_contrast_mean,
        soft_argmin,
    )
    from adaptive_stereo_tpu.ops.pallas.aggregation import (
        aggregate_cost_volume_pallas,
        aggregate_cost_volume_ref,
    )
    from adaptive_stereo_tpu.ops.pallas.coarse_head import (
        coarse_head_pallas,
        coarse_head_pallas_supported,
        coarse_head_ref,
    )

    D, H, W, C = 12, 20, 60, 32
    rng = np.random.RandomState(0)
    params = {
        "kernels": jnp.asarray(rng.randn(4, 3, 3, 3, C, C) * 0.1, jnp.float32),
        "biases": jnp.asarray(rng.randn(4, C) * 0.1, jnp.float32),
        "scales": jnp.asarray(1 + rng.randn(4, C) * 0.1, jnp.float32),
        "bn_biases": jnp.asarray(rng.randn(4, C) * 0.1, jnp.float32),
        "final_kernel": jnp.asarray(rng.randn(3, 3, 3, C, 1) * 0.1, jnp.float32),
        "final_bias": jnp.asarray(rng.randn(1) * 0.1, jnp.float32),
    }
    print(f"[exp_coarse_head] device={jax.devices()[0]}", flush=True)
    results = {}
    for B in (1, 2, 4):
        for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
            if not coarse_head_pallas_supported((B, H, W, C), D, dtype):
                print(json.dumps({f"skip_B{B}_{tag}": "VMEM budget"}),
                      flush=True)
                continue
            fl = jnp.asarray(rng.randn(B, H, W, C), dtype)
            fr = jnp.asarray(rng.randn(B, H, W, C), dtype)
            # CONSISTENT running stats (see exp_agg_eval.py): derive them
            # from the data's own batch statistics so eval normalization
            # bounds layer growth.
            rs_fn = jax.jit(lambda fl, fr, p: coarse_head_ref(
                fl, fr, p, (jnp.zeros((4, C)), jnp.ones((4, C))), True, D)[2:])
            rs = rs_fn(fl, fr, params)

            for train in (False, True):
                mode = "train" if train else "eval"
                xla = jax.jit(lambda fl, fr, p: coarse_head_ref(
                    fl, fr, p, rs, train, D)[:2])

                def semi_fn(fl, fr, p):
                    cost5 = difference_cost_volume(fl, fr, D)
                    out, _, _ = aggregate_cost_volume_pallas(
                        cost5, p, rs, train)
                    cost = out.astype(jnp.float32)
                    return soft_argmin(cost, axis=1), feature_contrast_mean(cost)

                semi = jax.jit(semi_fn)
                fused = jax.jit(lambda fl, fr, p: coarse_head_pallas(
                    fl, fr, p, rs, D, train)[:2])

                d_ref, f_ref = (np.asarray(x, np.float32)
                                for x in xla(fl, fr, params))
                for name, fn in (("semi", semi), ("fused", fused)):
                    d, f = (np.asarray(x, np.float32) for x in fn(fl, fr, params))
                    # disparity in [0, D): absolute tolerance; FCS same band
                    # as the aggregation checks (bf16 ULP effects compound
                    # through softmax). f32 TRAIN mode gets a wider band:
                    # the in-kernel BN batch statistics run through MXU tap
                    # matmuls at TPU-default matmul precision, so train-mode
                    # f32 matches the XLA twin only to ~bf16 ULP (measured
                    # max |d| = 0.053 on TPU; eval-mode f32 is 0.008). The
                    # production paths are bf16 (bench) and f32-eval
                    # (serving); f32-train never runs through these kernels.
                    dtol = (0.02 if not train else 0.1) if tag == "f32" else 0.25
                    bad_d = int((np.abs(d - d_ref) > dtol).sum())
                    maxd = float(np.abs(d - d_ref).max())
                    maxf = float(np.abs(f - f_ref).max())
                    print(json.dumps({
                        "B": B, "dtype": tag, "mode": mode, "impl": name,
                        "disp_bad": bad_d, "disp_maxd": round(maxd, 4),
                        "fcs_maxd": round(maxf, 4), "n": int(d_ref.size)}),
                        flush=True)
                    assert bad_d <= (0 if tag == "f32" and not train else 30), \
                        f"parity FAILED B={B} {tag} {mode} {name}"

                key = f"B{B}_{tag}_{mode}"
                results[f"xla_{key}_ms"] = timeit(xla, fl, fr, params)
                results[f"semi_{key}_ms"] = timeit(semi, fl, fr, params)
                results[f"fused_{key}_ms"] = timeit(fused, fl, fr, params)
                print(json.dumps({k: round(v, 3) for k, v in results.items()
                                  if key in k}), flush=True)
    print(json.dumps({k: round(v, 3) for k, v in sorted(results.items())}),
          flush=True)
    print("[exp_coarse_head] PASS", flush=True)


if __name__ == "__main__":
    main()
