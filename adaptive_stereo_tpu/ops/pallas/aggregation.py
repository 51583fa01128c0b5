"""Pallas TPU kernel: fused 3D-conv cost-volume aggregation stack.

The reference aggregates the cost volume with 4x [Conv3d 32->32 k3 + BN3d +
LeakyReLU(0.2)] + Conv3d 32->1 k3 (reference stereo_net.py:155-162,185-187) —
the BASELINE north star names this stack as Pallas target #2. XLA lowers it
as five separate convolutions with HBM round-trips and layout copies between
them; at the coarse resolution the whole volume is ~2 MB, so the stack is
bandwidth/overhead-bound, not FLOP-bound.

This kernel runs ALL FIVE layers in one pallas_call with the activations
resident in VMEM:

- Layout: 4 adjacent w-columns x 32 channels pack the 128 vector lanes
  (lane = phase*32 + c); rows flatten (d, h, w_packed) with zero borders in
  d and h (plus one guard row at each end) pre-padded by the host wrapper.
  A conv tap (kd, kh) is then a STATIC row shift; the 3-tap w conv becomes
  three (128, 128) matmuls per (kd, kh) with phase-structured matrices
  BUILT ON THE HOST (XLA) from the original (3,3,3,32,32) weights and
  passed in as kernel inputs (~4.4 MB bf16 for all five layers):
    A_main[q*32:(q+1)*32, p*32:(p+1)*32] = K[kd, kh, q-p+1]  (|q-p| <= 1)
    A_left [96:128,   0:32] = K[kd, kh, 0]   (w-1 crossing a packed column)
    A_right[  0:32, 96:128] = K[kd, kh, 2]   (w+1 crossing a packed column)
  (final layer: C_out = 1, so output phase p lands on lane p).
  Host-side construction matters for correctness, not just simplicity:
  building these matrices inside the kernel with single-lane column stores
  (`a_ref[q*32:(q+1)*32, p] = tap`) passes in interpreter mode but
  MISCOMPILES for bf16 on real TPUs — Mosaic cannot lower the bf16
  vector<1x32> -> vector<32x1> minor-dim insertion ("Insertion of minor dim
  that is not a no-op only supported for 32-bit types"; standalone it is a
  compile error, in a larger kernel it silently produced garbage). See
  scripts/debug_agg*.py for the bisection that isolated this.
  Column-boundary validity is a row-granular mask (w_packed == 0 / Wp-1),
  applied once per layer — no gathers, no dynamic shapes.
- Activation buffers are ALWAYS f32 in VMEM, holding compute-dtype-ROUNDED
  values; slices are cast to the compute dtype at each matmul input (exact:
  the values are bf16-representable), so the MXU still runs bf16 while
  every strided/unaligned slice load+store uses 32-bit (8,128) tiles. This
  too is a miscompile workaround, not a style choice: with bf16 (16,128)
  tiling, the kernel's unaligned row slices compile correctly at small row
  counts but produce wrong values at the paper shape's ~4.6k rows
  (scripts/debug_agg5.py: f32 exact at paper shape, bf16 wrong at B=1 and
  B=2 while small shapes pass) — f32 activation tiles sidestep the broken
  lowering with identical numerics and ~2x activation VMEM.
- Activations ping-pong between two zero-bordered VMEM buffers; each layer
  accumulates its 27 tap matmuls into one f32 accumulator and stores the
  conv output rounded to the compute dtype (exactly what the XLA path's
  conv would have produced), so BatchNorm sees the same values: f32
  statistics of the rounded activations, fast-variance E[x^2]-E[x]^2 —
  flax semantics. Running stats are returned to the caller (the flax
  wrapper owns the momentum update); eval mode normalizes with the running
  stats passed in. LeakyReLU(0.2) fuses into the BN epilogue, applied
  in-place on the interior rows (borders stay zero for the next layer).

Backward: custom VJP that re-runs the jnp twin (`aggregate_cost_volume_ref`)
under jax.vjp — gradients are exactly those of the XLA path (rematerialized),
while the forward (inference / DONE-state streaming) takes the fused kernel.

Golden twin: aggregate_cost_volume_ref (same function both tests and the
backward use). Parity tests: tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAKY_SLOPE = 0.2
_NUM_BN_LAYERS = 4
_C = 32
_PHASES = 4
_LANES = _PHASES * _C  # 128
# Mosaic's scoped-vmem accounting charges a stack slot per live temporary in
# the fully-unrolled 135-matmul body, so the kernel raises the compiler's
# scoped limit and gates admission on the buffer estimate below (which now
# includes the host-built tap matrices as inputs).
_VMEM_BUDGET = 48 * 2 ** 20
_VMEM_COMPILER_LIMIT = 100 * 2 ** 20


# ---------------------------------------------------------------------------
# jnp golden twin (flax ConvBN3D-stack semantics on raw parameters)
# ---------------------------------------------------------------------------

def aggregate_cost_volume_ref(
    cost: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    run_stats: Tuple[jnp.ndarray, jnp.ndarray],
    train: bool,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reference aggregation stack in plain jnp (XLA path / golden twin).

    Args:
      cost: (B, D, H, W, 32) cost volume (model compute dtype).
      params: dict with
        kernels (4, 3, 3, 3, 32, 32) f32, biases (4, 32) f32,
        scales (4, 32) f32, bn_biases (4, 32) f32,
        final_kernel (3, 3, 3, 32, 1) f32, final_bias (1,) f32.
      run_stats: (rmean (4, 32) f32, rvar (4, 32) f32) running BN stats.
      train: True -> batch statistics; False -> running statistics.

    Returns (out (B, D, H, W) in cost.dtype,
             batch_mu (4, 32) f32, batch_var (4, 32) f32).
    In eval mode batch_mu/var echo the running stats.
    """
    cdtype = cost.dtype
    x = cost
    mus, vars_ = [], []
    for i in range(_NUM_BN_LAYERS):
        k = params["kernels"][i].astype(cdtype)
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + params["biases"][i].astype(cdtype)
        if train:
            yf = y.astype(jnp.float32)
            mu = jnp.mean(yf, axis=(0, 1, 2, 3))
            var = jnp.mean(yf * yf, axis=(0, 1, 2, 3)) - mu * mu
        else:
            mu, var = run_stats[0][i], run_stats[1][i]
        mus.append(mu)
        vars_.append(var)
        dt = jnp.promote_types(cdtype, jnp.float32) if cdtype == jnp.float32 else cdtype
        yn = (y.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + eps)
        yn = yn * params["scales"][i] + params["bn_biases"][i]
        x = jax.nn.leaky_relu(yn.astype(dt), _LEAKY_SLOPE).astype(cdtype)
    kf = params["final_kernel"].astype(cdtype)
    out = jax.lax.conv_general_dilated(
        x, kf, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + params["final_bias"].astype(cdtype)
    return out[..., 0], jnp.stack(mus), jnp.stack(vars_)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _build_tap_matrices(params, cdtype):
    """Phase-structured (128, 128) matmul matrices for every layer and tap,
    built with plain XLA ops on the host side of the pallas_call.

    Returns (A_main, A_left, A_right), each (5, 3, 3, 128, 128) in cdtype.
    Layers 0..3 use params['kernels'][l] (C_out = 32, output block p*32);
    layer 4 uses params['final_kernel'] (C_out = 1, output lane p).
    """
    # P[kw, q, p] = 1 iff input phase q feeds output phase p via w-tap kw
    # (kw = q - p + 1), phases staying inside one packed column.
    qi = jnp.arange(_PHASES)
    pmat = (qi[None, :, None] - qi[None, None, :] + 1
            == jnp.arange(3)[:, None, None]).astype(jnp.float32)

    def blockify(K):  # (3, 3, 3, 32, co) -> main/left/right (3, 3, 128, 128)
        co = K.shape[-1]
        # kron(P[kw], K[kd, kh, kw]) summed over kw: block (q, p) = K[.., q-p+1]
        main = jnp.einsum("wqp,dhwio->dhqipo", pmat, K)
        main = main.reshape(3, 3, _LANES, _PHASES * co)
        zeros = jnp.zeros((3, 3, _LANES, _PHASES * co), jnp.float32)
        # left cross: source phase 3 (rows 96:128) -> output phase 0, tap kw=0
        left = zeros.at[:, :, 3 * _C:, 0:co].set(K[:, :, 0])
        # right cross: source phase 0 (rows 0:32) -> output phase 3, tap kw=2
        right = zeros.at[:, :, 0:_C, (_PHASES - 1) * co:].set(K[:, :, 2])
        if co != _C:  # final layer: pad output lanes 4 -> 128
            pad = [(0, 0), (0, 0), (0, 0), (0, _LANES - _PHASES * co)]
            main, left, right = (jnp.pad(x, pad) for x in (main, left, right))
        return main, left, right

    per_layer = [blockify(params["kernels"][i].astype(jnp.float32))
                 for i in range(_NUM_BN_LAYERS)]
    per_layer.append(blockify(params["final_kernel"].astype(jnp.float32)))
    return tuple(jnp.stack([pl_[kind] for pl_ in per_layer]).astype(cdtype)
                 for kind in range(3))


def _stack_body(src0_ref, am_ref, al_ref, ar_ref, b_ref, bf_ref, sc_ref,
                bb_ref, rm_ref, rv_ref, mu_ref, var_ref,
                x0_ref, x1_ref, xm_ref, acc_ref, emit_final,
                *, B, D, H, Wp, train, eps):
    """The five-layer conv+BN+LeakyReLU stack on packed rows, shared by the
    aggregation kernel and the fused coarse-head kernel (coarse_head.py).

    src0_ref holds the packed zero-bordered cost volume (layer-0 input);
    emit_final(b) is called once per batch element with acc_ref holding the
    final conv's f32 output rows (lanes 0..3 = the 4 packed phases).
    """
    R = (D + 2) * (H + 2) * Wp
    R2 = R + 2          # one guard row at each end (w-cross slices read +-1)
    S = (H + 3) * Wp
    Racc = R - 2 * S
    cdtype = am_ref.dtype   # compute dtype; activation buffers are f32
    count = float(B * D * H * Wp * _PHASES)

    def base_of(kd, kh):
        return ((kd - 1) * (H + 2) + (kh - 1)) * Wp

    # Row-granular masks: packed-column index of each row (guard rows are
    # zero, their mask value is irrelevant).
    rows = jax.lax.broadcasted_iota(jnp.int32, (R2, 1), 0)
    wp_idx = (rows - 1) % Wp
    mask_l = (wp_idx != (Wp - 1)).astype(jnp.float32)  # kills w-1 cross at w=0
    mask_r = (wp_idx != 0).astype(jnp.float32)         # kills w+1 cross at w=W-1
    # Phase-fold-and-tile matrix: (s @ T)[p*32+c] = sum_q s[q*32+c] — folds
    # the 4 phase copies of each channel and re-tiles in one MXU pass
    # (Mosaic has no 1-D 128 -> (4,32) reshape).
    t_rows = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0) % _C
    t_cols = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1) % _C
    fold_tile = (t_rows == t_cols).astype(jnp.float32)

    # Ping-pong activation buffers: only interior rows are ever written, so
    # zeroing once keeps the conv borders zero through all layers.
    for b in range(B):
        x0_ref[b] = jnp.zeros((R2, _LANES), jnp.float32)
        x1_ref[b] = jnp.zeros((R2, _LANES), jnp.float32)

    for layer in range(_NUM_BN_LAYERS + 1):
        final = layer == _NUM_BN_LAYERS
        src_ref = src0_ref if layer == 0 else (
            x0_ref if layer % 2 == 1 else x1_ref)
        dst_ref = x0_ref if layer % 2 == 0 else x1_ref

        for b in range(B):
            if final:
                acc_ref[:] = jnp.full((Racc, _LANES), bf_ref[0], jnp.float32)
            else:
                bias_t = jnp.concatenate([b_ref[layer]] * _PHASES)
                acc_ref[:] = jnp.broadcast_to(bias_t[None, :], (Racc, _LANES))

            # Main taps (phases stay inside their packed column — the zero
            # d/h borders make every read valid, no masking).
            for kd in range(3):
                for kh in range(3):
                    s0 = S + base_of(kd, kh) + 1   # +1: front guard row
                    acc_ref[:] += jnp.dot(
                        src_ref[b, s0:s0 + Racc].astype(cdtype),
                        am_ref[layer, kd, kh],
                        preferred_element_type=jnp.float32)

            # Left crosses (out phase 0 reads w-1 from the previous packed
            # column) — one shared masked source buffer, two fill passes.
            xm_ref[:] = src_ref[b] * mask_l
            for kd in range(3):
                for kh in range(3):
                    s0 = S + base_of(kd, kh) + 1
                    acc_ref[:] += jnp.dot(
                        xm_ref[s0 - 1:s0 - 1 + Racc].astype(cdtype),
                        al_ref[layer, kd, kh],
                        preferred_element_type=jnp.float32)

            # Right crosses (out phase 3 reads w+1 from the next column).
            xm_ref[:] = src_ref[b] * mask_r
            for kd in range(3):
                for kh in range(3):
                    s0 = S + base_of(kd, kh) + 1
                    acc_ref[:] += jnp.dot(
                        xm_ref[s0 + 1:s0 + 1 + Racc].astype(cdtype),
                        ar_ref[layer, kd, kh],
                        preferred_element_type=jnp.float32)

            if final:
                emit_final(b)
            else:
                # Store the conv output ROUNDED to the compute dtype — the
                # same values the XLA path's conv materializes, so the BN
                # statistics below match the twin bit-for-bit in spirit —
                # held in f32 buffers (see module docstring).
                y = acc_ref[:].astype(cdtype).astype(jnp.float32)
                for d in range(1, D + 1):
                    r0 = (d * (H + 2) + 1) * Wp
                    dst_ref[b, r0 + 1:r0 + 1 + H * Wp] = \
                        y[r0 - S:r0 - S + H * Wp]

        if final:
            continue

        if train:
            # BatchNorm statistics over the whole batch (borders are zero and
            # contribute nothing; count uses the true interior size). f32,
            # fast-variance — flax semantics.
            s1 = jnp.zeros((1, _LANES), jnp.float32)
            s2 = jnp.zeros((1, _LANES), jnp.float32)
            for b in range(B):
                yb = dst_ref[b].astype(jnp.float32)
                s1 = s1 + jnp.sum(yb, axis=0, keepdims=True)
                s2 = s2 + jnp.sum(yb * yb, axis=0, keepdims=True)
            # (1, 128) phase-folded+tiled means: every lane p*32+c holds mu_c.
            mu_t = jnp.dot(s1, fold_tile,
                           preferred_element_type=jnp.float32) / count
            var_t = jnp.dot(s2, fold_tile,
                            preferred_element_type=jnp.float32) / count - mu_t * mu_t
            mu_ref[layer] = mu_t[0, :_C]
            var_ref[layer] = var_t[0, :_C]
        else:
            # Eval mode: running statistics only — the batch-stat sums and
            # fold matmuls are skipped entirely (serving-path cost).
            mu_t = jnp.concatenate([rm_ref[layer]] * _PHASES)[None, :]
            var_t = jnp.concatenate([rv_ref[layer]] * _PHASES)[None, :]
            mu_ref[layer] = rm_ref[layer]
            var_ref[layer] = rv_ref[layer]

        sc_t = jnp.concatenate([sc_ref[layer]] * _PHASES)[None, :]
        bb_t = jnp.concatenate([bb_ref[layer]] * _PHASES)[None, :]
        inv = jax.lax.rsqrt(var_t + eps)
        scale = (sc_t * inv)[0]
        shift = (bb_t - sc_t * mu_t * inv)[0]
        # Normalize + LeakyReLU in place on the interior rows (borders stay
        # zero for the next layer's conv).
        for b in range(B):
            for d in range(1, D + 1):
                r0 = (d * (H + 2) + 1) * Wp
                t = dst_ref[b, r0 + 1:r0 + 1 + H * Wp]
                t = t * scale[None, :] + shift[None, :]
                t = jnp.where(t >= 0, t, _LEAKY_SLOPE * t)
                dst_ref[b, r0 + 1:r0 + 1 + H * Wp] = \
                    t.astype(cdtype).astype(jnp.float32)


def _kernel(xpad_ref, am_ref, al_ref, ar_ref, b_ref, bf_ref, sc_ref, bb_ref,
            rm_ref, rv_ref,
            out_ref, mu_ref, var_ref,
            x0_ref, x1_ref, xm_ref, acc_ref,
            *, B, D, H, Wp, train, eps):
    def emit_final(b):
        out_ref[b] = acc_ref[:, :8]

    _stack_body(xpad_ref, am_ref, al_ref, ar_ref, b_ref, bf_ref, sc_ref,
                bb_ref, rm_ref, rv_ref, mu_ref, var_ref,
                x0_ref, x1_ref, xm_ref, acc_ref, emit_final,
                B=B, D=D, H=H, Wp=Wp, train=train, eps=eps)


def _pack(cost: jnp.ndarray, Wp: int) -> jnp.ndarray:
    """(B, D, H, W, 32) -> zero-bordered packed rows (B, R + 2, 128)."""
    b, d, h, w, c = cost.shape
    x = cost.reshape(b, d, h, Wp, _LANES)
    x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0), (0, 0)])
    x = x.reshape(b, (d + 2) * (h + 2) * Wp, _LANES)
    return jnp.pad(x, [(0, 0), (1, 1), (0, 0)])   # guard rows for w-crosses


def _unpack(out: jnp.ndarray, D: int, H: int, Wp: int) -> jnp.ndarray:
    """(B, Racc, 8) kernel output -> (B, D, H, W) final cost."""
    b = out.shape[0]
    S = (H + 3) * Wp
    padded = jnp.pad(out, [(0, 0), (S, S), (0, 0)])
    vol = padded.reshape(b, D + 2, H + 2, Wp, 8)[:, 1:D + 1, 1:H + 1, :, :_PHASES]
    return vol.reshape(b, D, H, Wp * _PHASES)


def _vmem_bytes(shape, dtype) -> int:
    """Upper-bound estimate of the kernel's VMEM footprint."""
    b, d, h, w, c = shape
    wp = w // _PHASES
    r2 = (d + 2) * (h + 2) * wp + 2
    racc = r2 - 2 - 2 * (h + 3) * wp
    item = jnp.dtype(dtype).itemsize
    act = (3 * b + 1) * r2 * _LANES * 4             # xpad + x0 + x1 + xm (f32)
    accs = 2 * racc * _LANES * 4                    # acc + live matmul temp
    out = b * racc * 8 * 4
    # Host-built tap matrices: 3 kinds x 5 layers x 9 (kd,kh) x (128,128)
    weights = 3 * 5 * 9 * _LANES * _LANES * item + 16 * _C * 4
    return act + accs + out + weights


def aggregation_pallas_supported(cost_shape, dtype=jnp.float32) -> bool:
    """True when the fused kernel covers this shape/dtype (C=32, W%4==0,
    and the working set fits the VMEM budget)."""
    b, d, h, w, c = cost_shape
    return (c == _C and w % _PHASES == 0
            and _vmem_bytes(cost_shape, dtype) <= _VMEM_BUDGET)


def _forward(cost, params, run_stats, train, eps, interpret):
    if interpret is None:  # auto: interpreter off-TPU (tests on CPU)
        interpret = jax.default_backend() != "tpu"
    if not aggregation_pallas_supported(cost.shape, cost.dtype):
        # Fail loud rather than silently diverge: callers gate on
        # aggregation_pallas_supported().
        raise ValueError(
            f"pallas aggregation unsupported for shape {cost.shape} "
            f"dtype {cost.dtype}: needs C=32, W % 4 == 0, and "
            f"{_vmem_bytes(cost.shape, cost.dtype) / 2**20:.1f} MB <= "
            f"{_VMEM_BUDGET / 2**20:.0f} MB VMEM")
    B, D, H, W, _ = cost.shape
    Wp = W // _PHASES
    R = (D + 2) * (H + 2) * Wp
    S = (H + 3) * Wp
    Racc = R - 2 * S
    cdtype = cost.dtype

    # Activation / input buffers are f32 carrying cdtype-rounded values
    # (see module docstring: bf16 tiles miscompile at large row counts).
    xpad = _pack(cost, Wp).astype(jnp.float32)
    a_main, a_left, a_right = _build_tap_matrices(params, cdtype)
    rmean, rvar = run_stats

    out, mu, var = pl.pallas_call(
        functools.partial(_kernel, B=B, D=D, H=H, Wp=Wp, train=train, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((B, Racc, 8), jnp.float32),
            jax.ShapeDtypeStruct((_NUM_BN_LAYERS, _C), jnp.float32),
            jax.ShapeDtypeStruct((_NUM_BN_LAYERS, _C), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, R + 2, _LANES), jnp.float32),   # ping
            pltpu.VMEM((B, R + 2, _LANES), jnp.float32),   # pong
            pltpu.VMEM((R + 2, _LANES), jnp.float32),      # shared masked view
            pltpu.VMEM((Racc, _LANES), jnp.float32),       # f32 accumulator
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_COMPILER_LIMIT),
        interpret=interpret,
    )(
        xpad,
        a_main,
        a_left,
        a_right,
        params["biases"].astype(jnp.float32),
        params["final_bias"].astype(jnp.float32),
        params["scales"].astype(jnp.float32),
        params["bn_biases"].astype(jnp.float32),
        rmean.astype(jnp.float32),
        rvar.astype(jnp.float32),
    )
    return _unpack(out, D, H, Wp).astype(cdtype), mu, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def aggregate_cost_volume_pallas(cost, params, run_stats, train,
                                 eps: float = 1e-5, interpret=None):
    """Fused aggregation stack on TPU via Pallas.

    Differentiable w.r.t. cost and params; run_stats carry zero gradients
    (flax running-average updates are a non-differentiated side channel).
    Returns (out (B, D, H, W), batch_mu (4, 32), batch_var (4, 32)).
    """
    return _forward(cost, params, run_stats, train, eps, interpret)


def _fwd(cost, params, run_stats, train, eps, interpret):
    outs = _forward(cost, params, run_stats, train, eps, interpret)
    return outs, (cost, params, run_stats)


def _bwd(train, eps, interpret, res, cts):
    """Gradients of the jnp twin (rematerialized XLA backward — identical to
    the non-Pallas path; the kernel's win is the forward)."""
    cost, params, run_stats = res
    g_out, _g_mu, _g_var = cts
    _, vjp = jax.vjp(
        lambda c, p: aggregate_cost_volume_ref(c, p, run_stats, train, eps)[0],
        cost, params)
    g_cost, g_params = vjp(g_out.astype(jnp.float32).astype(cost.dtype))
    zeros = tuple(jnp.zeros_like(s) for s in run_stats)
    return g_cost, g_params, zeros


aggregate_cost_volume_pallas.defvjp(_fwd, _bwd)
