"""AOT / compiled-executable serialization probe on the axon TPU backend
(VERDICT r3 item 9, ROADMAP item 2).

Cold-start on the tunneled TPU pays 5-10 min of remote compiles per process
because the axon PJRT backend did not serialize compiled programs when the
persistent compile cache landed (utils/compile_cache.py). This probe checks
every serialization path JAX offers, on the REAL backend, and records which
work:

  1. jax.export (StableHLO portable artifact): export + serialize +
     deserialize + call. Portability path — still recompiles on import, but
     proves the lowering round-trips.
  2. jax.experimental.serialize_executable.{serialize,deserialize_and_load}:
     pickles the COMPILED PJRT executable — the actual cold-start killer if
     it works.
  3. The persistent compilation cache writing real TPU executables
     (jax._src.compilation_cache hit/miss counters across two compiles of
     the same program after cache-clearing the in-memory jit cache).

Writes a human log to stdout (redirect to artifacts/aot_probe_r4.log) and
exits 0 always — the OUTCOME is the artifact either way.

Run: timeout 3000 python scripts/probe_aot_export.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def section(name):
    print(f"\n=== {name} ===", flush=True)


def main():
    from adaptive_stereo_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = "/tmp/jax_probe_cache"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
    enable_persistent_cache(cache_dir)

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device={dev} platform={dev.platform} jax={jax.__version__}",
          flush=True)

    # Small-but-real program: one eval forward of the flagship model.
    from adaptive_stereo_tpu.engine import create_train_state
    from adaptive_stereo_tpu.engine.steps import make_eval_step
    from adaptive_stereo_tpu.models import StereoModel

    k, s, h, w = 4, 0, 64, 96
    model = StereoModel(k=k, input_scale=s, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), left, left, 1e-4)
    batch = {f"color_l/{s}": left, f"color_r/{s}": left,
             f"gt_disp_l/{s}": jnp.ones((1, h, w, 1), jnp.float32)}
    eval_step = make_eval_step(model, s, k)

    t0 = time.perf_counter()
    ref_out = eval_step(state.params, state.batch_stats, batch)
    jax.block_until_ready(ref_out)
    print(f"baseline jit compile+run: {time.perf_counter() - t0:.1f}s",
          flush=True)
    ref_epe = float(ref_out["EPE"])

    # --- 1. jax.export round-trip ---------------------------------------
    # MEASURED OUTCOME (artifacts/aot_probe_r4.log): jax.export HANGS on the
    # axon backend (>11 min with no progress on a program whose jit compile
    # takes 3.1 s); gated behind --try_export so the probe completes.
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--try_export", action="store_true")
    a = ap.parse_args()
    section("jax.export (StableHLO portable artifact)")
    if not a.try_export:
        print("SKIPPED (hangs on axon; pass --try_export to retry)",
              flush=True)
    else:
      try:
        from jax import export as jexport

        exported = jexport.export(jax.jit(eval_step))(
            state.params, state.batch_stats, batch)
        blob = exported.serialize()
        print(f"export+serialize OK: {len(blob)/1e6:.2f} MB", flush=True)
        reimported = jexport.deserialize(blob)
        t0 = time.perf_counter()
        out2 = reimported.call(state.params, state.batch_stats, batch)
        jax.block_until_ready(out2)
        print(f"deserialized call OK in {time.perf_counter() - t0:.1f}s "
              f"(EPE {float(out2['EPE']):.5f} vs {ref_epe:.5f})", flush=True)
      except Exception:
        print("jax.export FAILED:", flush=True)
        traceback.print_exc()

    # --- 2. compiled-executable pickling --------------------------------
    section("serialize_executable (compiled PJRT executable)")
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
            serialize,
        )

        compiled = jax.jit(eval_step).lower(
            state.params, state.batch_stats, batch).compile()
        payload, in_tree, out_tree = serialize(compiled)
        print(f"serialize OK: {len(payload)/1e6:.2f} MB", flush=True)
        t0 = time.perf_counter()
        loaded = deserialize_and_load(payload, in_tree, out_tree)
        out3 = loaded(state.params, state.batch_stats, batch)
        jax.block_until_ready(out3)
        print(f"deserialize+run OK in {time.perf_counter() - t0:.1f}s "
              f"(EPE {float(out3['EPE']):.5f} vs {ref_epe:.5f})", flush=True)
    except Exception:
        print("serialize_executable FAILED:", flush=True)
        traceback.print_exc()

    # --- 3. persistent compilation cache behavior ------------------------
    section("persistent compilation cache (JAX_COMPILATION_CACHE_DIR)")
    try:
        files_before = sum(len(fs) for _, _, fs in os.walk(cache_dir))
        # A distinct program (different static shape) to force a fresh compile.
        left2 = jnp.asarray(rng.rand(1, h, w * 2, 3), jnp.float32)
        batch2 = {f"color_l/{s}": left2, f"color_r/{s}": left2,
                  f"gt_disp_l/{s}": jnp.ones((1, h, w * 2, 1), jnp.float32)}
        t0 = time.perf_counter()
        jax.block_until_ready(eval_step(state.params, state.batch_stats, batch2))
        t_first = time.perf_counter() - t0
        files_after = sum(len(fs) for _, _, fs in os.walk(cache_dir))
        print(f"fresh-shape compile {t_first:.1f}s; cache files "
              f"{files_before} -> {files_after} "
              f"({'WROTE executables' if files_after > files_before else 'NOTHING WRITTEN — backend does not serialize'})",
              flush=True)
    except Exception:
        print("cache probe FAILED:", flush=True)
        traceback.print_exc()

    print("\nprobe complete", flush=True)


if __name__ == "__main__":
    main()
