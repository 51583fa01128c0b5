"""Pallas TPU kernels: fused edge-aware refinement tower, forward AND backward.

The refinement head runs 8 full-resolution convolution layers (reference
stereo_net.py:88-121: conv2d_feature + 6 dilated BasicBlocks + conv2d_out) —
in the s2d layout (models/s2d_refinement.py) that is 8x [3x3 conv over
(B, H/2, W/2, 128) + BN/residual epilogues]. The round-4 roofline study
showed the adapt step bytes-bound with the conv category dominated by ~50
small fwd+bwd convolution fusions and ~5.8 ms of layout copies between them
(artifacts/profile_single_r4.log, PERFORMANCE.md); VERDICT r4 item 1 names
fused VMEM-resident tower kernels (fwd + bwd) as the remaining lever.

Design (one pallas_call per layer, 8 fwd + 8 bwd, chained at the XLA level):

- Layout: flattened padded rows — position (h, w) of the (H2, W2, 128) s2d
  activation lives at row h*PW + w of a (H2+8)*(PW=W2+8) x 128 buffer, with
  4 zero pad rows/cols on every side (4 = the largest s2d dilation). A conv
  tap (ty, tx, dilation d2) is then ONE static row shift of
  (ty-1)*d2*PW + (tx-1)*d2, and the 3x3 dilated conv is 9 shifted
  (rows, 128) @ (128, 128) MXU matmuls — no im2col, no gathers, dense
  128-lane feeds (the phase-scattered s2d weights are 25% dense, but a
  32-wide phase-split would starve the MXU; dense wins).
- Each layer's kernel FUSES the previous layer's epilogue: it reads the
  previous conv output y_{p-1} and residual input, applies
  BatchNorm (y*nrm + shift from batch statistics) + LeakyReLU + residual add
  on the fly in VMEM, and convolves — so between layers only ONE bf16 copy
  of each activation crosses HBM (XLA's lowering round-trips un-fused
  activations several times per layer and inserts layout copies).
- BatchNorm batch statistics: each layer's call accumulates per-lane
  sum / sum-of-squares of its (rounded) conv output into constant-index
  output blocks that live in VMEM across the whole grid; the host-side chain
  folds the 4 s2d phases per original channel and feeds the finalized
  nrm/shift vectors to the next layer's call. This keeps the EXACT
  train-mode batch-statistic semantics (the hard part of fusing BN towers:
  stats are global, tiles are local).
- Grid: (B, T) row-bands of Rh s2d rows; halo rows come from prev/cur/next
  neighbor blocks of the same buffer (three BlockSpecs on one array), so
  there is no halo recompute anywhere.
- Backward is the full custom VJP, also as 8 chained per-layer kernels
  (layer p's backward consumes gx_{p+1}, emits gx_p, dW_p, db_p and the
  BN-backward reduction sums S1/S2 for layer p-1 — exactly the batch-stat
  BN gradient, including the mean-subtraction terms). Weight-scatter (s2d
  phase structure), phase folds and pad transposes live OUTSIDE the
  custom_vjp boundary as plain jnp, so jax autodiff transposes them.
- Mosaic safety (lessons from ops/pallas/aggregation.py): activations are
  sliced as f32 VALUES (cast from bf16 immediately after the aligned block
  read) and recast to bf16 only at matmul inputs; all slice offsets are
  static per call (dilation is static per layer).

Numerics vs the jnp twin (EdgeAwareRefinementS2D): conv accumulation f32 ->
rounded to the compute dtype per layer (what XLA's conv emits); the BN
epilogue is computed in f32 from f32 statistics where the bf16 twin computes
it in bf16 — a documented one-ULP-scale deviation, covered by the band
tolerances in tests/test_pallas_tower.py. f32 mode matches to float
reassociation only.

Reference: stereo_net.py:88-121 (EdgeAwareRefinement); scatter derivation in
models/s2d_refinement.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAKY = 0.2
_EPS = 1e-5
_HALO = 4                       # max s2d dilation, static halo for all layers
_PAD = 4                        # zero border rows/cols in the padded layout
_LANES = 128
# Per-layer s2d dilations: conv2d_feature, astrous_0..5 (orig 1,2,4,8,1,1),
# conv2d_out.
_D2 = (1, 1, 1, 2, 4, 1, 1, 1)
_NLAYERS = 8
_NBN = 7                        # layers 0..6 carry BatchNorm
_VMEM_LIMIT = 100 * 2 ** 20


def _geometry(H2: int, W2: int, itemsize: int = 2,
              for_bwd: bool = False) -> Tuple[int, int, int, int]:
    """(Rh, T, PW, Hp) for the padded flattened-row layout, or raises.

    The band height is bounded by Mosaic's scoped-VMEM stack for the fully
    unrolled tap temporaries (measured: the f32 backward at Rh=14/W2=480
    needs 110.9 MB > the 100 MB limit); the backward kernel carries ~10
    band blocks + f32 value temps, the forward ~6, and f32 doubles the
    block bytes — hence the per-case caps below. Rh only affects blocking,
    never the buffer layout, so fwd and bwd may use different bands.
    """
    if W2 % 8 != 0:
        raise ValueError(f"tower kernel needs W2 % 8 == 0, got {W2}")
    Hp = H2 + 2 * _PAD
    PW = W2 + 2 * _PAD
    # Byte caps on the band (RhP * itemsize), calibrated at the paper shape
    # (PW=488): f32 backward fits at Rh=6 and OOMs at 14; f32 forward and
    # bf16 backward fit at 12; bf16 forward at 14.
    cap_bytes = (6 if for_bwd else 12) * 488 * 4
    # Largest divisor of the padded H that covers one guard
    # (RhP >= HALO*PW + HALO, excludes Rh == _HALO) and fits the byte cap.
    for Rh in range(min(Hp, 16), _HALO, -1):
        if (Hp % Rh == 0 and Rh * PW >= _HALO * PW + _HALO
                and Rh * PW * itemsize <= cap_bytes):
            return Rh, Hp // Rh, PW, Hp
    raise ValueError(
        f"no usable band height divides padded H {Hp} (PW={PW}, "
        f"itemsize={itemsize}, bwd={for_bwd})")


def tower_pallas_supported(H2: int, W2: int) -> bool:
    try:
        _geometry(H2, W2, 4, False)
        _geometry(H2, W2, 4, True)
        return True
    except ValueError:
        return False


def _guard(PW: int) -> int:
    """Guard elements each side of the flattened extended band: the largest
    combined tap offset is HALO rows AND HALO columns = HALO*PW + HALO."""
    return _HALO * PW + _HALO


def _masks(t, RhP, PW, H2, W2, rows, guard, dtype=jnp.float32):
    """Validity mask (rows, 1) over a flattened band starting at global
    flattened index t*RhP - guard: padded h in [PAD, PAD+H2), col in
    [PAD, PAD+W2). Out-of-buffer guard rows are zero-filled by _assemble;
    their mask value is irrelevant."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    g = t * RhP - guard + r
    ph = g // PW
    col = g - ph * PW
    valid = (ph >= _PAD) & (ph < _PAD + H2) & (col >= _PAD) & (col < _PAD + W2)
    return valid.astype(dtype)


def _assemble(prev_ref, cur_ref, next_ref, t, T, guard):
    """Extended f32 value from three neighbor blocks: (RhP + 2*guard, 128).
    Edge bands substitute zeros (those flattened rows do not exist)."""
    prev = prev_ref[0].astype(jnp.float32)
    cur = cur_ref[0].astype(jnp.float32)
    nxt = next_ref[0].astype(jnp.float32)
    RhP = cur.shape[0]
    head = jnp.where(t > 0, prev[RhP - guard:], 0.0)
    tail = jnp.where(t < T - 1, nxt[:guard], 0.0)
    return jnp.concatenate([head, cur, tail], axis=0)


def _conv_taps(x_ext, w_ref, d2, PW, RhP, cdtype, transpose=False):
    """9 shifted matmuls: y[r] = sum_taps x_ext[r + shift] @ W[ty, tx]
    (or W^T when transpose, contracting the OUT channel dim). x_ext has
    _guard(PW) guard rows each side; returns (RhP, 128) f32."""
    s0 = _guard(PW)
    acc = jnp.zeros((RhP, _LANES), jnp.float32)
    for ty in range(3):
        for tx in range(3):
            shift = (ty - 1) * d2 * PW + (tx - 1) * d2
            if transpose:
                shift = -shift
            sl = x_ext[s0 + shift:s0 + shift + RhP].astype(cdtype)
            w = w_ref[ty, tx]
            dn = (((1,), (1,)), ((), ())) if transpose else \
                (((1,), (0,)), ((), ()))
            acc = acc + jax.lax.dot_general(
                sl, w, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
    return acc


# ---------------------------------------------------------------------------
# Forward per-layer kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, p, d2, Rh, T, PW, H2, W2, cdtype, train, emit_stats):
    """One tower layer: [epilogue of layer p-1] + conv + bias (+ stat sums).

    Ref order (inputs then outputs):
      p == 0 : x0_prev, x0_cur, x0_next, w, vec, y_out[, s1, s2]
      p >= 1 : xp3 (3, zeros-unused at p==1), yp3 (3), w, vec,
               y_out, x_out[, s1, s2]
    vec rows: 0 bias; 1 nrm (gamma*rsqrt(var+eps)); 2 shift (beta-mu*nrm).
    """
    t = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (t == 0)
    RhP = Rh * PW
    G = _guard(PW)
    E = RhP + 2 * G

    if p == 0:
        (xp_prev, xp_cur, xp_next, w_ref, vec_ref), outs = refs[:5], refs[5:]
        x_ext = _assemble(xp_prev, xp_cur, xp_next, t, T, G)
        # Input already carries zero pads; mask anyway for edge-band safety.
        x_ext = x_ext * _masks(t, RhP, PW, H2, W2, E, G)
    else:
        (xp_prev, xp_cur, xp_next, yp_prev, yp_cur, yp_next,
         w_ref, vec_ref), outs = refs[:8], refs[8:]
        y_ext = _assemble(yp_prev, yp_cur, yp_next, t, T, G)
        nrm = vec_ref[1][None, :]
        shift = vec_ref[2][None, :]
        act = y_ext * nrm + shift
        act = jnp.where(act >= 0, act, _LEAKY * act)
        if p == 1:
            x_ext = act                      # no residual into the first block
        else:
            xr_ext = _assemble(xp_prev, xp_cur, xp_next, t, T, G)
            x_ext = xr_ext + act
        # Round to the compute dtype (the value the XLA path materializes)
        # and zero the pad/outside rows so conv taps see true zero borders.
        x_ext = x_ext.astype(cdtype).astype(jnp.float32) \
            * _masks(t, RhP, PW, H2, W2, E, G)

    acc = _conv_taps(x_ext, w_ref, d2, PW, RhP, cdtype)
    acc = acc + vec_ref[0][None, :]          # conv bias
    y = (acc * _masks(t, RhP, PW, H2, W2, RhP, 0)).astype(cdtype)

    if p == 0:
        y_out = outs[0]
        y_out[0] = y
    else:
        y_out, x_out = outs[0], outs[1]
        y_out[0] = y
        x_out[0] = x_ext[G:G + RhP].astype(cdtype)

    if emit_stats:
        s1_ref, s2_ref = outs[-2], outs[-1]
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=0, keepdims=True)
        s2 = jnp.sum(yf * yf, axis=0, keepdims=True)

        @pl.when(first)
        def _():
            s1_ref[...] = s1
            s2_ref[...] = s2

        @pl.when(jnp.logical_not(first))
        def _():
            s1_ref[...] += s1
            s2_ref[...] += s2


def _fwd_layer(p, x_prev, y_prev, w, vec, B, H2, W2, cdtype, train, interpret):
    """Invoke layer p's forward kernel. x_prev is x0p for p == 0 (and for
    p == 1 an unused zeros-(B,1,128) placeholder is synthesized); returns
    (y_p, x_p or None, s1 or None, s2 or None)."""
    Rh, T, PW, Hp = _geometry(H2, W2, jnp.dtype(cdtype).itemsize, False)
    RhP = Rh * PW
    emit_stats = train and p < _NBN

    def band(i):  # three neighbor blocks of one (B, Hp*PW, 128) buffer
        return pl.BlockSpec(
            (1, RhP, _LANES),
            lambda b, t, i=i: (b, jnp.clip(t + i, 0, T - 1), 0),
            memory_space=pltpu.VMEM)

    full = lambda shape: pl.BlockSpec(
        shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((B, Hp * PW, _LANES), cdtype)]
    out_specs = [pl.BlockSpec((1, RhP, _LANES), lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)]
    if p > 0:
        out_shape.append(jax.ShapeDtypeStruct((B, Hp * PW, _LANES), cdtype))
        out_specs.append(pl.BlockSpec((1, RhP, _LANES),
                                      lambda b, t: (b, t, 0),
                                      memory_space=pltpu.VMEM))
    if emit_stats:
        out_shape += [jax.ShapeDtypeStruct((1, _LANES), jnp.float32)] * 2
        out_specs += [full((1, _LANES))] * 2

    in_specs = [band(-1), band(0), band(1)]
    args = [x_prev, x_prev, x_prev]
    if p > 0:
        in_specs += [band(-1), band(0), band(1)]
        args += [y_prev, y_prev, y_prev]
    in_specs += [full((3, 3, _LANES, _LANES)), full((3, _LANES))]
    args += [w, vec]

    kernel = functools.partial(
        _fwd_kernel, p=p, d2=_D2[p], Rh=Rh, T=T, PW=PW, H2=H2, W2=W2,
        cdtype=cdtype, train=train, emit_stats=emit_stats)
    outs = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    y = outs[0]
    x = outs[1] if p > 0 else None
    s1 = outs[-2] if emit_stats else None
    s2 = outs[-1] if emit_stats else None
    return y, x, s1, s2


def _fold(v):
    """(1, 128) per-lane sums -> (128,) per-channel (4-phase folded, tiled)."""
    return jnp.tile(v.reshape(4, 32).sum(axis=0), 4)


def tower_forward(x0p, wstack, bias_t, gamma_t, beta_t, rmean_t, rvar_t,
                  train, B, H2, W2, cdtype, interpret):
    """Full 8-layer chain. Returns (y7, mu_t (7,128), var_t (7,128),
    xbufs list[7], ybufs list[8]) — mu/var are batch stats in train mode,
    running stats echoed in eval mode (per-lane tiled)."""
    count = 4.0 * B * H2 * W2
    ybufs, xbufs, mus, vars_ = [], [], [], []
    x_prev, y_prev = x0p, None
    nrm = shift = None
    for p in range(_NLAYERS):
        if p == 0:
            vec = jnp.stack([bias_t[0], jnp.zeros(_LANES), jnp.zeros(_LANES)])
        else:
            vec = jnp.stack([bias_t[p], nrm, shift])
        y, x, s1, s2 = _fwd_layer(
            p, x_prev, y_prev, wstack[p], vec.astype(jnp.float32),
            B, H2, W2, cdtype, train, interpret)
        ybufs.append(y)
        if p > 0:
            xbufs.append(x)
        if p < _NBN:
            if train:
                mu = _fold(s1) / count
                var = _fold(s2) / count - mu * mu
            else:
                mu, var = rmean_t[p], rvar_t[p]
            mus.append(mu)
            vars_.append(var)
            nrm = gamma_t[p] * jax.lax.rsqrt(var + _EPS)
            shift = beta_t[p] - mu * nrm
        x_prev, y_prev = (x if p > 0 else x0p), y
    return ybufs[-1], jnp.stack(mus), jnp.stack(vars_), xbufs, ybufs


# ---------------------------------------------------------------------------
# Backward per-layer kernels
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, p, d2, Rh, T, PW, H2, W2, cdtype, emit_s):
    """Backward of tower layer p.

    Ref order:
      gx_next3 (3), y_p3 (3, p < 7 only), x_p3 (3), y_pm1 (1, p >= 1 only),
      w, vec  ->  gx_out, dw, db[, s1, s2]
    vec rows: 0 mu_p; 1 inv_p; 2 nrm_p; 3 shift_p; 4 m1_p; 5 m2_p;
              6 mu_pm1; 7 inv_pm1; 8 nrm_pm1; 9 shift_pm1.
    (For p == 7 rows 0-5 are unused; for p == 0 rows 6-9 are unused.)
    """
    t = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (t == 0)
    RhP = Rh * PW
    G = _guard(PW)
    E = RhP + 2 * G
    i = 0
    g_prev, g_cur, g_next = refs[i:i + 3]; i += 3
    if p < _NLAYERS - 1:
        yp_prev, yp_cur, yp_next = refs[i:i + 3]; i += 3
    xp_prev, xp_cur, xp_next = refs[i:i + 3]; i += 3
    if p >= 1:
        ypm1_ref = refs[i]; i += 1
    w_ref, vec_ref = refs[i:i + 2]; i += 2
    outs = refs[i:]
    gx_out, dw_ref, db_ref = outs[0], outs[1], outs[2]

    ext_mask = _masks(t, RhP, PW, H2, W2, E, G)
    c_mask = _masks(t, RhP, PW, H2, W2, RhP, 0)
    gxn_ext = _assemble(g_prev, g_cur, g_next, t, T, G)

    # g wrt y_p on extended rows (BN backward with batch statistics).
    if p == _NLAYERS - 1:
        gy_ext = gxn_ext * ext_mask
    else:
        y_ext = _assemble(yp_prev, yp_cur, yp_next, t, T, G)
        mu, inv = vec_ref[0][None, :], vec_ref[1][None, :]
        nrm, shf = vec_ref[2][None, :], vec_ref[3][None, :]
        m1, m2 = vec_ref[4][None, :], vec_ref[5][None, :]
        xhat = (y_ext - mu) * inv
        dlrelu = jnp.where(y_ext * nrm + shf >= 0, 1.0, _LEAKY)
        gl = gxn_ext * dlrelu
        gy_ext = (nrm * (gl - m1 - xhat * m2)) * ext_mask

    s0 = G
    gy_c = gy_ext[s0:s0 + RhP]

    # db and dW accumulate across the whole grid in constant-index blocks.
    db = jnp.sum(gy_c, axis=0, keepdims=True)

    @pl.when(first)
    def _():
        db_ref[...] = db

    @pl.when(jnp.logical_not(first))
    def _():
        db_ref[...] += db

    x_ext = _assemble(xp_prev, xp_cur, xp_next, t, T, G)
    gyc_cd = gy_c.astype(cdtype)
    for ty in range(3):
        for tx in range(3):
            shift_rc = (ty - 1) * d2 * PW + (tx - 1) * d2
            sl = x_ext[s0 + shift_rc:s0 + shift_rc + RhP].astype(cdtype)
            dw = jax.lax.dot_general(
                sl, gyc_cd, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(first)
            def _(dw=dw, ty=ty, tx=tx):
                dw_ref[ty, tx] = dw

            @pl.when(jnp.logical_not(first))
            def _(dw=dw, ty=ty, tx=tx):
                dw_ref[ty, tx] += dw

    # Transposed conv: gx[r] = sum_taps gy[r - shift] @ W[ty,tx]^T.
    gx = _conv_taps(gy_ext, w_ref, d2, PW, RhP, cdtype, transpose=True)
    if 1 <= p <= _NLAYERS - 2:
        gx = gx + gxn_ext[s0:s0 + RhP]       # residual passthrough
    gx = gx * c_mask
    gx_out[0] = gx.astype(cdtype)

    if emit_s:
        # BN-backward reduction sums for layer p-1 (consumed by the next
        # backward call): S1 = sum gl, S2 = sum gl*xhat, per lane.
        ypm1 = ypm1_ref[0].astype(jnp.float32)
        mu1, inv1 = vec_ref[6][None, :], vec_ref[7][None, :]
        nrm1, shf1 = vec_ref[8][None, :], vec_ref[9][None, :]
        xh1 = (ypm1 - mu1) * inv1
        dlr1 = jnp.where(ypm1 * nrm1 + shf1 >= 0, 1.0, _LEAKY)
        gl1 = gx * dlr1
        s1 = jnp.sum(gl1, axis=0, keepdims=True)
        s2 = jnp.sum(gl1 * xh1, axis=0, keepdims=True)
        s1_ref, s2_ref = outs[3], outs[4]

        @pl.when(first)
        def _():
            s1_ref[...] = s1
            s2_ref[...] = s2

        @pl.when(jnp.logical_not(first))
        def _():
            s1_ref[...] += s1
            s2_ref[...] += s2


def _bwd_layer(p, gx_next, y_p, x_p, y_pm1, w, vec, B, H2, W2, cdtype,
               interpret):
    """Invoke layer p's backward kernel. Returns (gx_p, dw, db, s1, s2)
    (s1/s2 None for p == 0)."""
    Rh, T, PW, Hp = _geometry(H2, W2, jnp.dtype(cdtype).itemsize, True)
    RhP = Rh * PW
    emit_s = p >= 1

    def band(i):
        return pl.BlockSpec(
            (1, RhP, _LANES),
            lambda b, t, i=i: (b, jnp.clip(t + i, 0, T - 1), 0),
            memory_space=pltpu.VMEM)

    full = lambda shape: pl.BlockSpec(
        shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM)

    in_specs = [band(-1), band(0), band(1)]
    args = [gx_next] * 3
    if p < _NLAYERS - 1:
        in_specs += [band(-1), band(0), band(1)]
        args += [y_p] * 3
    in_specs += [band(-1), band(0), band(1)]
    args += [x_p] * 3
    if emit_s:
        in_specs.append(pl.BlockSpec((1, RhP, _LANES),
                                     lambda b, t: (b, t, 0),
                                     memory_space=pltpu.VMEM))
        args.append(y_pm1)
    in_specs += [full((3, 3, _LANES, _LANES)), full((10, _LANES))]
    args += [w, vec]

    out_shape = [
        jax.ShapeDtypeStruct((B, Hp * PW, _LANES), cdtype),
        jax.ShapeDtypeStruct((3, 3, _LANES, _LANES), jnp.float32),
        jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, RhP, _LANES), lambda b, t: (b, t, 0),
                     memory_space=pltpu.VMEM),
        full((3, 3, _LANES, _LANES)),
        full((1, _LANES)),
    ]
    if emit_s:
        out_shape += [jax.ShapeDtypeStruct((1, _LANES), jnp.float32)] * 2
        out_specs += [full((1, _LANES))] * 2

    kernel = functools.partial(
        _bwd_kernel, p=p, d2=_D2[p], Rh=Rh, T=T, PW=PW, H2=H2, W2=W2,
        cdtype=cdtype, emit_s=emit_s)
    outs = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    if emit_s:
        return outs[0], outs[1], outs[2], outs[3], outs[4]
    return outs[0], outs[1], outs[2], None, None


def tower_backward(g_y7, x0p, xbufs, ybufs, wstack, gamma_t, beta_t, mu_t,
                   var_t, B, H2, W2, cdtype, interpret):
    """Full backward chain (train-mode batch-stat BN gradients).

    Returns (dx0p, dW (8,3,3,128,128) f32, db (8,128) f32,
             dgamma_t (7,128) f32, dbeta_t (7,128) f32)."""
    count = 4.0 * B * H2 * W2
    inv_t = jax.lax.rsqrt(var_t + _EPS)          # (7, 128)
    nrm_t = gamma_t * inv_t
    shift_t = beta_t - mu_t * nrm_t              # bnout = y*nrm + shift
    gx_next = g_y7
    dws, dbs = [None] * _NLAYERS, [None] * _NLAYERS
    s1_prev = s2_prev = None          # sums for layer p-1, produced at pass p
    dgammas, dbetas = [None] * _NBN, [None] * _NBN
    zeros = jnp.zeros((1, _LANES), jnp.float32)
    for p in range(_NLAYERS - 1, -1, -1):
        if p < _NBN:
            m1 = _fold(s1_prev)[None, :] / count
            m2 = _fold(s2_prev)[None, :] / count
            vec_p = [mu_t[p], inv_t[p], nrm_t[p], shift_t[p], m1[0], m2[0]]
            dgammas[p] = s2_prev[0]
            dbetas[p] = s1_prev[0]
        else:
            vec_p = [zeros[0]] * 6
        if p >= 1:
            q = p - 1
            vec_q = [mu_t[q], inv_t[q], nrm_t[q], shift_t[q]]
        else:
            vec_q = [zeros[0]] * 4
        vec = jnp.stack(vec_p + vec_q).astype(jnp.float32)
        x_p = x0p if p == 0 else xbufs[p - 1]
        y_p = ybufs[p] if p < _NLAYERS - 1 else None
        y_pm1 = ybufs[p - 1] if p >= 1 else None
        gx_next, dws[p], dbs[p], s1_prev, s2_prev = _bwd_layer(
            p, gx_next, y_p, x_p, y_pm1, wstack[p], vec,
            B, H2, W2, cdtype, interpret)
    return (gx_next, jnp.stack(dws), jnp.concatenate(dbs, axis=0),
            jnp.stack(dgammas), jnp.stack(dbetas))


# ---------------------------------------------------------------------------
# custom_vjp wrapper (differentiable w.r.t. x0p and all parameter stacks)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def tower_pallas(x0p, wstack, bias_t, gamma_t, beta_t, rmean_t, rvar_t,
                 train, interpret, H2, W2):
    """Fused refinement tower on the padded flattened-row layout.

    Args:
      x0p: (B, (H2+8)*(W2+8), 128) input (s2d guidance+disp, zero-padded,
           lanes >= 16 zero).
      wstack: (8, 3, 3, 128, 128) phase-scattered s2d conv kernels
              (layer 0 in-lanes >= 16 zero; layer 7 out-lanes >= 4 zero).
      bias_t: (8, 128) conv biases (phase-tiled).
      gamma_t/beta_t: (7, 128) BN scale/bias (phase-tiled).
      rmean_t/rvar_t: (7, 128) running stats (phase-tiled; eval mode only).
      train: static — batch statistics (True) or running statistics.
      H2/W2: static s2d spatial dims (H/2, W/2 of the guidance image).

    Returns (y7 buffer (B, (H2+8)*(W2+8), 128) with the residual in lanes
    0..3, mu_t (7,128), var_t (7,128) batch statistics).
    """
    B = x0p.shape[0]
    y7, mu, var, _, _ = tower_forward(
        x0p, wstack, bias_t, gamma_t, beta_t, rmean_t, rvar_t, train,
        B, H2, W2, x0p.dtype, interpret)
    return y7, mu, var


def _tower_fwd(x0p, wstack, bias_t, gamma_t, beta_t, rmean_t, rvar_t,
               train, interpret, H2, W2):
    B = x0p.shape[0]
    y7, mu, var, xbufs, ybufs = tower_forward(
        x0p, wstack, bias_t, gamma_t, beta_t, rmean_t, rvar_t, train,
        B, H2, W2, x0p.dtype, interpret)
    res = (x0p, tuple(xbufs), tuple(ybufs), wstack, gamma_t, beta_t, mu, var)
    return (y7, mu, var), res


def _tower_bwd(train, interpret, H2, W2, res, cts):
    if not train:
        raise NotImplementedError(
            "tower_pallas backward requires train=True (eval forwards are "
            "not differentiated in any engine)")
    x0p, xbufs, ybufs, wstack, gamma_t, beta_t, mu, var = res
    g_y7, _g_mu, _g_var = cts
    B = x0p.shape[0]
    g_y7 = g_y7.astype(x0p.dtype)
    dx0p, dW, db, dgamma, dbeta = tower_backward(
        g_y7, x0p, list(xbufs), list(ybufs), wstack, gamma_t, beta_t, mu, var,
        B, H2, W2, x0p.dtype, interpret)
    return (dx0p, dW.astype(wstack.dtype), db, dgamma, dbeta,
            jnp.zeros_like(mu), jnp.zeros_like(var))


tower_pallas.defvjp(_tower_fwd, _tower_bwd)
