"""Pallas TPU kernel: the ENTIRE coarse stereo head in one VMEM-resident pass.

Fuses the three stages the reference runs as separate modules over the
(B, D, h, w, 32) cost volume — build (stereo_net.py:169-184), the 5-layer
3D-conv aggregation (stereo_net.py:155-162,185-187), and the
softmax/soft-argmin regression + Feature Contrast Score
(stereo_net.py:190-192 + feature_contrast.py:12-23) — into a single
pallas_call. The inputs are just the two coarse feature maps (~150 KB each at
the paper shape); the ~2 MB cost volume and all five activation tensors live
and die in VMEM, and only the coarse disparity + per-pixel FCS maps
(~150 KB each) return to HBM. Compared to running the three pieces
separately (even with the fused aggregation kernel), this removes the
volume's HBM write+read on both sides of the stack and the extra
softmax/top-2 passes XLA makes over the final volume.

Layout: identical packed-row scheme as ops/pallas/aggregation.py (see its
docstring for the layout, the tap-matrix formulation, and the two Mosaic
miscompile workarounds this kernel inherits: host-built tap matrices, f32
activation buffers carrying compute-dtype-rounded values).

In-kernel cost-volume build: the packed lane axis IS the flattened (w, c)
axis (lane = (w % 4) * 32 + c, row = h * W/4 + w // 4), so "shift the right
features by d pixels" is a shift by d*32 lanes = a STATIC shift of d//4 rows
plus a static lane rotation of (d*32)%128 with one-row carry — two static
slices and a concat per disparity, unrolled over the small static D. The
x < d out-of-frame border is a lane-granular iota mask, matching
ops.difference_cost_volume exactly.

In-kernel epilogue: for output disparity d0 the final conv's interior rows
are CONTIGUOUS in the accumulator (rows [d0*(H+2)*Wp, +H*Wp)), so the
disparity axis is walked with static row slices: one streaming pass for
(max, runner-up with first-occurrence tie semantics, sum) and one pass for
the stabilized softmax expectation. FCS = max - (sum - top2) / (D - 2),
exactly ops.feature_contrast_mean's sort-free contract.

Backward: custom VJP rematerializing the jnp twin (coarse_head_ref) — the
gradients are exactly the XLA path's; the kernel's win is the forward
(serving / DONE-state streaming). FCS carries stop-gradient semantics and
running stats zero gradients, as everywhere else.

Golden twin: coarse_head_ref (difference_cost_volume +
aggregate_cost_volume_ref + soft_argmin + feature_contrast_mean).
Parity tests: tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cost_volume import difference_cost_volume
from ..fcs import feature_contrast_mean
from ..soft_argmin import soft_argmin
from .aggregation import (
    _LANES,
    _PHASES,
    _VMEM_BUDGET,
    _VMEM_COMPILER_LIMIT,
    _build_tap_matrices,
    _stack_body,
    _vmem_bytes,
    aggregate_cost_volume_ref,
)

_C = 32


# ---------------------------------------------------------------------------
# jnp golden twin
# ---------------------------------------------------------------------------

def coarse_head_ref(f_l, f_r, params, run_stats, train, num_disp,
                    eps: float = 1e-5):
    """XLA-composed coarse head (golden twin / backward remat).

    Args:
      f_l, f_r: (B, h, w, 32) coarse feature maps (model compute dtype).
      params / run_stats: as aggregate_cost_volume_ref.
      num_disp: static disparity count D (>= 3 for FCS).

    Returns (disp (B, h, w) f32, fcs (B, h, w) f32,
             batch_mu (4, 32) f32, batch_var (4, 32) f32).
    """
    cost5 = difference_cost_volume(f_l, f_r, num_disp)
    out, mu, var = aggregate_cost_volume_ref(cost5, params, run_stats,
                                             train, eps)
    cost = out.astype(jnp.float32)
    return soft_argmin(cost, axis=1), feature_contrast_mean(cost), mu, var


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _kernel(fl_ref, fr_ref, am_ref, al_ref, ar_ref, b_ref, bf_ref, sc_ref,
            bb_ref, rm_ref, rv_ref,
            disp_ref, fcs_ref, mu_ref, var_ref,
            xpad_ref, x0_ref, x1_ref, xm_ref, acc_ref, fpad_ref,
            *, B, D, H, Wp, train, eps):
    HWp = H * Wp
    G = (D - 1) // _PHASES + 2   # zero guard rows above fr for shifted reads
    R2 = xpad_ref.shape[1]
    cdtype = am_ref.dtype

    # Source-pixel validity for the cost build: lane (row, l) holds pixel
    # x = (row % Wp) * 4 + l // 32; the shifted right feature exists iff
    # x - d >= 0 (reference zero border, stereo_net.py:178-182).
    wp_i = jax.lax.broadcasted_iota(jnp.int32, (HWp, _LANES), 0) % Wp
    ph_i = jax.lax.broadcasted_iota(jnp.int32, (HWp, _LANES), 1) // _C
    xpix = wp_i * _PHASES + ph_i

    fpad_ref[:G] = jnp.zeros((G, _LANES), jnp.float32)
    for b in range(B):
        xpad_ref[b] = jnp.zeros((R2, _LANES), jnp.float32)
        fpad_ref[G:] = fr_ref[b]
        fl = fl_ref[b]
        for d in range(D):
            q, s = (d * _C) // _LANES, (d * _C) % _LANES
            main = fpad_ref[G - q:G - q + HWp]
            if s:
                carry = fpad_ref[G - q - 1:G - q - 1 + HWp]
                shifted = jnp.concatenate(
                    [carry[:, _LANES - s:], main[:, :_LANES - s]], axis=1)
            else:
                shifted = main
            # Round the difference to the compute dtype — the value the XLA
            # path's cost volume materializes — held in the f32 buffer.
            diff = (fl - shifted).astype(cdtype).astype(jnp.float32)
            diff = jnp.where(xpix >= d, diff, 0.0)
            r0 = ((d + 1) * (H + 2) + 1) * Wp + 1   # +1: front guard row
            xpad_ref[b, r0:r0 + HWp] = diff

    def emit_final(b):
        # acc rows for output disparity d0 start at d0*(H+2)*Wp (interior
        # h rows are contiguous; the h-border rows between slabs are junk
        # conv outputs that are simply never read).
        blk = (H + 2) * Wp

        def slab(d0):
            y = acc_ref[d0 * blk:d0 * blk + HWp]
            # Final conv output rounds to the compute dtype before the f32
            # softmax — same cast chain as the XLA path (stereo_net.py:258).
            return y.astype(cdtype).astype(jnp.float32)

        # Pass 1: streaming max / runner-up / sum over the disparity axis.
        # Strict > keeps the FIRST occurrence as the max, so a duplicated
        # max value becomes its own runner-up — torch.sort tie semantics
        # (ops/pallas/disparity.py).
        m1 = slab(0)
        total = m1
        m2 = jnp.full((HWp, _LANES), -jnp.inf, jnp.float32)
        for d0 in range(1, D):
            v = slab(d0)
            m2 = jnp.where(v > m1, m1, jnp.maximum(m2, v))
            m1 = jnp.maximum(m1, v)
            total = total + v

        # Pass 2: numerically stable softmax expectation.
        z = jnp.zeros((HWp, _LANES), jnp.float32)
        num = jnp.zeros((HWp, _LANES), jnp.float32)
        for d0 in range(D):
            p = jnp.exp(slab(d0) - m1)
            z = z + p
            num = num + float(d0) * p

        disp_ref[b] = (num / z)[:, :8]
        fcs_ref[b] = (m1 - (total - m1 - m2) / (D - 2))[:, :8]

    _stack_body(xpad_ref, am_ref, al_ref, ar_ref, b_ref, bf_ref, sc_ref,
                bb_ref, rm_ref, rv_ref, mu_ref, var_ref,
                x0_ref, x1_ref, xm_ref, acc_ref, emit_final,
                B=B, D=D, H=H, Wp=Wp, train=train, eps=eps)


def _extra_vmem_bytes(feat_shape, num_disp):
    """fpad scratch + disp/fcs outputs + epilogue temporaries (f32)."""
    b, h, w, c = feat_shape
    wp = w // _PHASES
    hwp = h * wp
    g = (num_disp - 1) // _PHASES + 2
    return (g + hwp) * _LANES * 4 + 2 * b * hwp * 8 * 4 + 7 * hwp * _LANES * 4


def coarse_head_pallas_supported(feat_shape, num_disp,
                                 dtype=jnp.float32) -> bool:
    """True when the fused coarse head covers this shape/dtype (C=32,
    W % 4 == 0, D >= 3, and the working set fits the VMEM budget)."""
    b, h, w, c = feat_shape
    cost_shape = (b, num_disp, h, w, c)
    return (c == _C and w % _PHASES == 0 and num_disp >= 3
            and _vmem_bytes(cost_shape, dtype) +
            _extra_vmem_bytes(feat_shape, num_disp) <= _VMEM_BUDGET)


def _forward(f_l, f_r, params, run_stats, num_disp, train, eps, interpret):
    if interpret is None:  # auto: interpreter off-TPU (tests on CPU)
        interpret = jax.default_backend() != "tpu"
    if not coarse_head_pallas_supported(f_l.shape, num_disp, f_l.dtype):
        raise ValueError(
            f"pallas coarse head unsupported for features {f_l.shape} "
            f"D={num_disp} dtype {f_l.dtype}: needs C=32, W % 4 == 0, "
            f"D >= 3, and the VMEM budget "
            f"(callers gate on coarse_head_pallas_supported)")
    B, H, W, _ = f_l.shape
    Wp = W // _PHASES
    D = num_disp
    R = (D + 2) * (H + 2) * Wp
    S = (H + 3) * Wp
    Racc = R - 2 * S
    G = (D - 1) // _PHASES + 2
    cdtype = f_l.dtype

    # (B, H, W, C) -> packed rows (B, H*Wp, 128); f32 buffers carrying
    # cdtype values (aggregation.py's bf16-tiling miscompile workaround).
    def pack_feat(f):
        return f.reshape(B, H * Wp, _LANES).astype(jnp.float32)

    a_main, a_left, a_right = _build_tap_matrices(params, cdtype)
    rmean, rvar = run_stats

    disp, fcs, mu, var = pl.pallas_call(
        functools.partial(_kernel, B=B, D=D, H=H, Wp=Wp, train=train,
                          eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((B, H * Wp, 8), jnp.float32),
            jax.ShapeDtypeStruct((B, H * Wp, 8), jnp.float32),
            jax.ShapeDtypeStruct((4, _C), jnp.float32),
            jax.ShapeDtypeStruct((4, _C), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((B, R + 2, _LANES), jnp.float32),   # built cost volume
            pltpu.VMEM((B, R + 2, _LANES), jnp.float32),   # ping
            pltpu.VMEM((B, R + 2, _LANES), jnp.float32),   # pong
            pltpu.VMEM((R + 2, _LANES), jnp.float32),      # shared masked view
            pltpu.VMEM((Racc, _LANES), jnp.float32),       # f32 accumulator
            pltpu.VMEM((G + H * Wp, _LANES), jnp.float32),  # guarded fr rows
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_COMPILER_LIMIT),
        interpret=interpret,
    )(
        pack_feat(f_l),
        pack_feat(f_r),
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

    def unpack(x):  # (B, H*Wp, 8) -> (B, H, W): lanes 0..3 are the phases
        return x[..., :_PHASES].reshape(B, H, W)

    return unpack(disp), unpack(fcs), mu, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def coarse_head_pallas(f_l, f_r, params, run_stats, num_disp, train,
                       eps: float = 1e-5, interpret=None):
    """Fused coarse head (cost volume + aggregation + soft-argmin + FCS).

    Differentiable w.r.t. f_l/f_r/params through the disparity output; FCS
    is stop-gradient (reference computes it under no_grad) and run_stats
    carry zero gradients. Returns (disp (B, h, w) f32, fcs (B, h, w) f32,
    batch_mu (4, 32) f32, batch_var (4, 32) f32).
    """
    return _forward(f_l, f_r, params, run_stats, num_disp, train, eps,
                    interpret)


def _fwd(f_l, f_r, params, run_stats, num_disp, train, eps, interpret):
    outs = _forward(f_l, f_r, params, run_stats, num_disp, train, eps,
                    interpret)
    return outs, (f_l, f_r, params, run_stats)


def _bwd(num_disp, train, eps, interpret, res, cts):
    """Gradients of the jnp twin (rematerialized XLA backward — identical to
    the non-Pallas path; the kernel's win is the forward)."""
    f_l, f_r, params, run_stats = res
    g_disp = cts[0]
    _, vjp = jax.vjp(
        lambda fl, fr, p: coarse_head_ref(fl, fr, p, run_stats, train,
                                          num_disp, eps)[0],
        f_l, f_r, params)
    g_fl, g_fr, g_params = vjp(g_disp.astype(jnp.float32))
    zeros = tuple(jnp.zeros_like(s) for s in run_stats)
    return g_fl, g_fr, g_params, zeros


coarse_head_pallas.defvjp(_fwd, _bwd)
