"""Device-resident reservoir (OVS) — Algorithm R as pure JAX state.

Motivation: this environment's TPU dispatch is remote; a blocking host
readback costs ~30 ms. The host-side reservoir (utils/stereo_reservoir.py)
forces one readback per adaptation step (the gate must know did_add before
bookkeeping). Moving the ENTIRE reservoir into device state removes every
per-step sync: the fused streaming step updates the buffer, the dedup
registry, the counters and the RNG key on device, and the host reads scalars
only at validation/logging boundaries.

Semantics mirror utils/stereo_reservoir.py (reference
utils/stereo_reservoir.py:5-69) including its quirks:
  - the dedup registry records only APPENDED indices (replacements don't
    register), so it is bounded by the buffer capacity and fits in a fixed
    device array;
  - the stream counter increments on every add() call (here: every novel
    frame), before the dedup check.
Divergence (documented): randomness comes from a jax PRNG key carried in the
state rather than python random — identical distribution, different stream.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DeviceReservoir:
    left: jnp.ndarray      # (cap, H, W, C)
    right: jnp.ndarray     # (cap, H, W, C)
    values: jnp.ndarray    # (cap,) float32 — per-item loss values
    reg_indices: jnp.ndarray  # (cap,) int32 — dedup registry (-1 = empty)
    size: jnp.ndarray      # () int32 — current fill
    count: jnp.ndarray     # () int32 — add() calls so far (novel frames)
    key: jnp.ndarray       # PRNG key


def init_device_reservoir(capacity: int, h: int, w: int, c: int = 3,
                          seed: int = 123) -> DeviceReservoir:
    return DeviceReservoir(
        left=jnp.zeros((capacity, h, w, c), jnp.float32),
        right=jnp.zeros((capacity, h, w, c), jnp.float32),
        values=jnp.zeros((capacity,), jnp.float32),
        reg_indices=jnp.full((capacity,), -1, jnp.int32),
        size=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(seed),
    )


def reservoir_maybe_add(
    res: DeviceReservoir,
    left_img: jnp.ndarray,   # (1, H, W, C) or (H, W, C)
    right_img: jnp.ndarray,
    value: jnp.ndarray,      # () loss value
    img_index: jnp.ndarray,  # () int32
    novel: jnp.ndarray,      # () bool — gate: only novel frames reach add()
) -> Tuple[DeviceReservoir, jnp.ndarray]:
    """One (gated) Algorithm-R add. Returns (new_reservoir, did_add)."""
    if left_img.ndim == 4:
        left_img = left_img[0]
        right_img = right_img[0]
    cap = res.values.shape[0]

    key, sub = jax.random.split(res.key)
    new_count = res.count + jnp.where(novel, 1, 0)

    dup = jnp.any(res.reg_indices == img_index)
    not_full = res.size < cap
    # randint(1, i) with i = count-after-increment; draw is unconditional
    # (masked out when unused) — same distribution as the reference.
    j = jax.random.randint(sub, (), 1, jnp.maximum(new_count, 1) + 1)

    do_append = novel & ~dup & not_full
    do_replace = novel & ~dup & ~not_full & (j <= cap)
    did_add = do_append | do_replace
    slot = jnp.where(do_append, res.size, j - 1)

    def write(buf, item):
        return jnp.where(
            did_add,
            jax.lax.dynamic_update_index_in_dim(buf, item, slot, 0),
            buf,
        )

    new_values = jnp.where(
        did_add, res.values.at[slot].set(value), res.values)
    # Registry records appends only (reference quirk, stereo_reservoir.py:53).
    new_reg = jnp.where(
        do_append, res.reg_indices.at[slot].set(img_index), res.reg_indices)

    return DeviceReservoir(
        left=write(res.left, left_img),
        right=write(res.right, right_img),
        values=new_values,
        reg_indices=new_reg,
        size=res.size + jnp.where(do_append, 1, 0),
        count=new_count,
        key=key,
    ), did_add


def reservoir_average_value(res: DeviceReservoir) -> jnp.ndarray:
    """Mean value over filled slots (0 if empty)."""
    cap = res.values.shape[0]
    mask = (jnp.arange(cap) < res.size).astype(jnp.float32)
    return jnp.sum(res.values * mask) / jnp.maximum(res.size.astype(jnp.float32), 1.0)


def reservoir_set_values(res: DeviceReservoir, new_values: jnp.ndarray) -> DeviceReservoir:
    """Replace per-slot values (used after batched OVS validation)."""
    return res.replace(values=new_values)
