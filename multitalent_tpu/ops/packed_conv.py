"""Space-to-depth packed 3D convolutions: MXU-shaped rewrites of small-channel convs.

Why: the nnU-Net family puts most FLOPs in stride-1 3x3x3 convs with 30-60
channels (reference generic_UNet.py:28-144 instantiates base_num_features=30/32).
The TPU MXU contracts 128x128 tiles, so XLA's native conv3d lowering runs those
layers at ~(C/128)^2 of peak (measured 10 TFLOP/s of 197 on v5e at C=30 — exactly
the (30/128)^2 ceiling). Packing spatial phases into the channel dimension
(space-to-depth) turns a C-channel conv into an (fy*fx*C)-channel conv on
1/(fy*fx) the voxels. The packed weight is block-sparse (each output phase only
sees taps of compatible input phases), so the dense packed conv does fy*fx times
the FLOPs of the original — but MXU utilization rises ~(fy*fx)^2, a large net
win, in pure XLA with no custom kernel. v5e measurements (flagship layers):
C=30 packed (2,2) -> C=120: 28.5 -> 16.8 ms per 3^3 conv at (2,96,192,192).

Per-axis factors: `factors=(fy, fx)` with fy, fx in {1, 2}; (2,2) packs a 2x2
(y,x) block (C -> 4C), (1,2) packs x only (C -> 2C, for C=60 stages where 4C
would overshoot the 128-lane tile). Factor-1 axes degenerate to the ordinary
convolution semantics on that axis.

Supported rewrites (all numerically exact, fp32-validated vs lax.conv/flax):
- stride-1 kxkxk conv in packed space:            packed_conv3d
- (sz,2,2)-strided conv consuming the packing:    packed_strided_conv3d
  (packed input -> unpacked strided output; how an nnU-Net encoder leaves a
  packed stage; factor-1 axes keep their stride)
- (sz,2,2) kernel==stride transposed conv producing the packing:
                                                  packed_conv_transpose3d
  (unpacked input -> packed output; decoder re-entry. On packed axes the taps
  BECOME the output phases; on factor-1 axes outputs interleave)
- 1x1x1 seg head in packed space:                 packed_pointwise_conv3d
  (phase-grouped einsum: zero FLOP overhead)

Weights stay in the canonical unpacked layout (kz, ky, kx, Cin, Cout) — the
same pytree the unpacked model uses, so checkpoints are interchangeable; the
packed weight is materialized inside jit by a scatter over the tiny weight
tensors (negligible next to the activations).

All functions take/return channels-last (N, Z, Y, X, C) arrays; packed channel
order is phase-major (py, px, c), matching space_to_depth_yx.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

F = 2  # default packing factor along y and x
P = F * F  # default phase count (factors=(2,2))


def nphases(factors) -> int:
    return int(factors[0]) * int(factors[1])


# ---------------------------------------------------------------------------
# layout transforms
# ---------------------------------------------------------------------------

def space_to_depth_yx(x: jax.Array, factors=(F, F)) -> jax.Array:
    """(N, Z, Y, X, C) -> (N, Z, Y/fy, X/fx, fy*fx*C); phase-major channel
    order (py, px, c). Y % fy == 0 and X % fx == 0 required."""
    fy, fx = int(factors[0]), int(factors[1])
    n, z, y, xdim, c = x.shape
    assert y % fy == 0 and xdim % fx == 0, (y, xdim, factors)
    x = x.reshape(n, z, y // fy, fy, xdim // fx, fx, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # (n, z, y', x', py, px, c)
    return x.reshape(n, z, y // fy, xdim // fx, fy * fx * c)


def depth_to_space_yx(x: jax.Array, factors=(F, F)) -> jax.Array:
    """Inverse of space_to_depth_yx."""
    fy, fx = int(factors[0]), int(factors[1])
    n, z, yp, xp, pc = x.shape
    c = pc // (fy * fx)
    x = x.reshape(n, z, yp, xp, fy, fx, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(n, z, yp * fy, xp * fx, c)


# ---------------------------------------------------------------------------
# packed weight construction
# ---------------------------------------------------------------------------

def _phase_tap_table(k: int, f: int) -> tuple[int, np.ndarray]:
    """For a stride-1 length-k conv (SAME, centered) along an axis packed by
    factor f: original input offset for output phase q and original tap d is
    t = q + d - k//2. In packed coords t = f*o + p with o the packed-kernel
    offset and p the input phase. Returns (kp, table) with kp the packed kernel
    length and table[q, d] = (tap index, input phase). f=1 degenerates to the
    identity mapping (kp=k, phase 0)."""
    half = k // 2
    offs = np.arange(k) - half
    o_min = min((q + int(d)) // f for q in range(f) for d in offs)
    o_max = max((q + int(d)) // f for q in range(f) for d in offs)
    kp = o_max - o_min + 1
    table = np.zeros((f, k, 2), np.int64)
    for q in range(f):
        for di, d in enumerate(offs):
            t = q + int(d)
            o = t // f
            table[q, di] = (o - o_min, t - f * o)
    return kp, table


def pack_conv_weights(w: jax.Array, factors=(F, F),
                      in_groups=None) -> jax.Array:
    """(kz, ky, kx, Cin, Cout) -> (kz, kyp, kxp, P*Cin, P*Cout) packed weight
    for a stride-1 SAME conv in packed (y,x) space (P = fy*fx). Phase-major
    channel order matches space_to_depth_yx.

    in_groups=(g0, g1, ...) with sum == Cin: the input tensor is a PLAIN
    channel concat of per-group phase-major blocks [P*g0 | P*g1 | ...] instead
    of phase-major over the full Cin — the decoder's up+skip concat then needs
    no 6-D phase-regrouping reshape (a ~3 ms full-tensor copy per b2 flagship
    forward on v5e, xprof); the permutation moves into this (tiny) weight."""
    fy, fx = int(factors[0]), int(factors[1])
    kz, ky, kx, cin, cout = w.shape
    kyp, ty = _phase_tap_table(ky, fy)
    kxp, tx = _phase_tap_table(kx, fx)
    wp = jnp.zeros((kz, kyp, kxp, fy, fx, cin, fy, fx, cout), w.dtype)
    for qy in range(fy):
        for dy in range(ky):
            oy, py = int(ty[qy, dy, 0]), int(ty[qy, dy, 1])
            for qx in range(fx):
                for dx in range(kx):
                    ox, px = int(tx[qx, dx, 0]), int(tx[qx, dx, 1])
                    wp = wp.at[:, oy, ox, py, px, :, qy, qx, :].set(
                        w[:, dy, dx, :, :])
    p = fy * fx
    wp = wp.reshape(kz, kyp, kxp, p * cin, p * cout)
    if in_groups is not None:
        assert sum(in_groups) == cin, (in_groups, cin)
        idx, base = [], 0
        for g in in_groups:
            for q in range(p):
                idx.extend(range(q * cin + base, q * cin + base + g))
            base += g
        wp = wp[:, :, :, np.asarray(idx, np.int64), :]
    return wp


def prepare_packed_conv3d(w: jax.Array, x_shape, *, factors=(F, F),
                          in_groups=None, sparse: bool = False):
    """Precompute the weight-derived arrays packed_conv3d needs for an input
    of `x_shape`, choosing the same execution path packed_conv3d would.

    Returns an opaque dict for apply_packed_conv3d. Callers running inside a
    device tile loop (the sliding-window engine) MUST do this outside the
    loop body: the packed-weight scatter builds compile to kLoop fusions that
    XLA re-executes every iteration when left in the body (~2.5 s of a 19 s
    bench volume, xprof round 4); XLA's while-loop passes sink rather than
    hoist them."""
    import os
    kz, ky, kx = w.shape[:3]
    pcin = int(x_shape[-1])
    if (sparse and kz == 3 and w.shape[1:3] == (3, 3)
            and tuple(factors) in ((2, 2), (1, 2))):
        # merged-tap kernel: 12 GEMMs instead of 27, zero lane movement
        # (per-lane selects of shifted halo views) — the winning rework of
        # the lane-gather sparse kernel (evicted measured loser,
        # scripts/pallas_sparse_conv_arm.py). Adjudicated on v5e
        # (scripts/merged_conv_probe.py, queue-timed): WINS only for (2,2)
        # single-K-tile convs (stage-0-class, 120->128 lanes: 5.78 -> 3.58
        # ms, 1.61x); the 256-lane grouped decoder conv LOSES 0.49x (select
        # passes scale with lanes) and (1,2) loses 0.83x (smaller GEMM
        # saving than its select overhead) — both stay on the dense kernel.
        from multitalent_tpu.ops import pallas_merged_conv as pmc
        # tiny-cin floor (same MTTPU_PALLAS_MIN_CIN crossover as the dense
        # tap kernel): below it the merged route would pad K 4->128 and
        # bypass the measured im2col tiny-cin formulation (stage-0 block0,
        # P*Cin = 4)
        if (pmc.merged_conv_enabled() and jax.default_backend() == "tpu"
                and tuple(factors) == (2, 2)
                and int(os.environ.get("MTTPU_PALLAS_MIN_CIN", "32"))
                <= pcin <= 128):
            from multitalent_tpu.ops.pallas_conv import _pick_blocks
            if _pick_blocks(int(x_shape[1]), int(x_shape[2]),
                            int(x_shape[3])) is not None:
                return {"kind": "merged",
                        "prep": pmc.prepare_merged(w, tuple(factors),
                                                   in_groups)}
    wp = pack_conv_weights(w, factors, in_groups)
    kyp, kxp = wp.shape[1], wp.shape[2]
    min_cin = int(os.environ.get("MTTPU_PALLAS_MIN_CIN", "32"))
    if (kz == 3 and (kyp, kxp) == (3, 3) and pcin >= min_cin):
        from multitalent_tpu.ops.pallas_conv import pallas_conv_enabled
        if pallas_conv_enabled():
            return {"kind": "pallas", "wp": wp}
    pad = ((kz // 2, kz - 1 - kz // 2),
           (kyp // 2, kyp - 1 - kyp // 2),
           (kxp // 2, kxp - 1 - kxp // 2))
    im2col_max_k = int(os.environ.get("MTTPU_IM2COL_MAX_K", "64"))
    if pcin * kz * kyp * kxp <= im2col_max_k and jax.default_backend() == "tpu":
        return {"kind": "im2col", "pad": pad, "kzyx": (kz, kyp, kxp),
                "wcol": wp.reshape(-1, wp.shape[-1])}
    return {"kind": "conv", "pad": pad, "wp": wp}


def apply_packed_conv3d(x_packed: jax.Array, prepared: dict) -> jax.Array:
    """Run packed_conv3d from prepare_packed_conv3d's arrays (weight
    transforms already materialized)."""
    kind = prepared["kind"]
    if kind == "merged":
        from multitalent_tpu.ops.pallas_merged_conv import (
            pallas_packed_conv3d_merged)
        return pallas_packed_conv3d_merged(x_packed, prepared["prep"])
    if kind == "pallas":
        from multitalent_tpu.ops.pallas_conv import conv3d_same_fast
        return conv3d_same_fast(x_packed, prepared["wp"])
    if kind == "im2col":
        kz, kyp, kxp = prepared["kzyx"]
        pad = prepared["pad"]
        xpad = jnp.pad(x_packed, ((0, 0), pad[0], pad[1], pad[2], (0, 0)))
        z, yp_, xp_ = x_packed.shape[1:4]
        cols = [xpad[:, dz:dz + z, dy:dy + yp_, dx:dx + xp_, :]
                for dz in range(kz) for dy in range(kyp) for dx in range(kxp)]
        col = jnp.concatenate(cols, axis=-1)
        return jnp.einsum("nzyxk,ko->nzyxo", col, prepared["wcol"])
    return lax.conv_general_dilated(
        x_packed, prepared["wp"], window_strides=(1, 1, 1),
        padding=prepared["pad"],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def packed_conv3d(x_packed: jax.Array, w: jax.Array, *, factors=(F, F),
                  precision=None, in_groups=None,
                  sparse: bool = False) -> jax.Array:
    """Stride-1 SAME conv on a packed tensor. `w` is canonical
    (kz, ky, kx, Cin, Cout); x_packed is (N, Z, Y', X', P*Cin).
    Equals space_to_depth(conv3d_same(depth_to_space(x), w)).
    `in_groups`: x_packed is a plain concat of phase-major groups
    (see pack_conv_weights).

    3x3x3 packed kernels route through the Pallas tap-GEMM conv when enabled
    (ops/pallas_conv.py: 118.7 vs 82.7 TFLOP/s on v5e at C=120); backward
    stays on XLA's conv via custom_vjp.

    sparse=True (inference-only, no grad support): route through the
    merged-tap kernel (ops/pallas_merged_conv.py) — 12 GEMMs instead of 27
    for (2,2) packing, zero lane movement — when enabled and the shape
    fits."""
    import os
    kz = w.shape[0]
    if (sparse and kz == 3 and w.shape[1:3] == (3, 3) and precision is None
            and tuple(factors) in ((2, 2), (1, 2))):
        from multitalent_tpu.ops import pallas_merged_conv as pmc
        if (pmc.merged_conv_enabled() and jax.default_backend() == "tpu"
                and tuple(factors) == (2, 2)
                and int(os.environ.get("MTTPU_PALLAS_MIN_CIN", "32"))
                <= x_packed.shape[-1] <= 128):
            # weight transform rebuilt inline — callers inside tile loops
            # must use the prepare/apply pair instead (gating mirrors
            # prepare_packed_conv3d: (2,2) single-K-tile convs only)
            try:
                return pmc.pallas_packed_conv3d_merged(
                    x_packed, pmc.prepare_merged(w, tuple(factors),
                                                 in_groups))
            except ValueError:
                pass  # unsupported shape: fall through
    wp = pack_conv_weights(w, factors, in_groups)
    kyp, kxp = wp.shape[1], wp.shape[2]
    # Tiny input channel counts (stage-0 block0: P*C_in = 4) waste the
    # 128-lane kernel 32x on its K dim; below the threshold XLA's own conv
    # lowering (implicit im2col, K = 27*C_in) is the better formulation.
    min_cin = int(os.environ.get("MTTPU_PALLAS_MIN_CIN", "32"))
    if (kz == 3 and (kyp, kxp) == (3, 3) and precision is None
            and x_packed.shape[-1] >= min_cin):
        from multitalent_tpu.ops.pallas_conv import (_pick_blocks,
                                                     conv3d_same_fast,
                                                     pallas_conv_enabled)
        if pallas_conv_enabled():
            # training path for the same conv class the inference merged
            # kernel won at ((2,2), single K tile): merged-tap forward via
            # custom_vjp, dense backward (MTTPU_MERGED_TRAIN=0 disables)
            from multitalent_tpu.ops import pallas_merged_conv as pmc
            if (tuple(factors) == (2, 2) and x_packed.shape[-1] <= 128
                    and jax.default_backend() == "tpu"
                    and pmc.merged_train_enabled()
                    and _pick_blocks(int(x_packed.shape[1]),
                                     int(x_packed.shape[2]),
                                     int(x_packed.shape[3])) is not None):
                return pmc.conv3d_same_merged_train(
                    x_packed, wp, tuple(factors), int(w.shape[3]),
                    tuple(in_groups) if in_groups is not None else None)
            return conv3d_same_fast(x_packed, wp)
    # SAME in original space == explicit padding (kp//2, kp-1-kp//2) in packed
    # cells: the phase-tap table centers the packed kernel so that zero-padding
    # original voxels land in zero-padded packed cells.
    pad = ((kz // 2, kz - 1 - kz // 2),
           (kyp // 2, kyp - 1 - kyp // 2),
           (kxp // 2, kxp - 1 - kxp // 2))
    pcin = x_packed.shape[-1]
    if (precision is None
            and pcin * kz * kyp * kxp
            <= int(os.environ.get("MTTPU_IM2COL_MAX_K", "64"))
            and jax.default_backend() == "tpu"):
        # Tiny-cin taps (stage-0 block0: P*C_in = 4, K = 12*4 = 48): XLA's
        # conv lowering crawls at ~7 TFLOP/s here (the MXU K dim is 4/128
        # occupied per tap). Explicit im2col turns it into ONE [M, 48] x
        # [48, P*Cout] GEMM; the 12x col blowup of the tiny input (~170 MB
        # bf16 at the flagship patch) is cheap next to the 6.4 ms/step the
        # conv costs otherwise (measured ~1.2 s/volume saved, v5e).
        xpad = jnp.pad(x_packed, ((0, 0), pad[0], pad[1], pad[2], (0, 0)))
        z, yp_, xp_ = x_packed.shape[1:4]
        cols = [xpad[:, dz:dz + z, dy:dy + yp_, dx:dx + xp_, :]
                for dz in range(kz) for dy in range(kyp) for dx in range(kxp)]
        col = jnp.concatenate(cols, axis=-1)
        return jnp.einsum("nzyxk,ko->nzyxo", col,
                          wp.reshape(-1, wp.shape[-1]))
    return lax.conv_general_dilated(
        x_packed, wp, window_strides=(1, 1, 1), padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision=precision)


# ---------------------------------------------------------------------------
# strided conv: packed input -> unpacked strided output (encoder downsampling)
# ---------------------------------------------------------------------------

def _phase_tap_table_strided(k: int, f: int,
                             lo: int | None = None) -> tuple[int, np.ndarray]:
    """Tap table for a stride-2 original conv evaluated on an f-packed axis
    (f in {1,2}): the conv's own stride on the packed grid is 2/f, so for f=2
    output cells read original voxels 2*y' + d - lo (one output per cell) and
    for f=1 the ordinary strided-conv geometry applies. `lo` is the original
    left padding (default the torch-SAME k//2); mirror-TTA's weight-flip
    execution passes the flipped-world lo (see flipped_strided_pads)."""
    if lo is None:
        lo = k // 2
    offs = np.arange(k) - lo
    o_min = min(int(d) // f for d in offs)
    o_max = max(int(d) // f for d in offs)
    kp = o_max - o_min + 1
    table = np.zeros((k, 2), np.int64)
    for di, d in enumerate(offs):
        o = int(d) // f
        table[di] = (o - o_min, int(d) - f * o)
    return kp, table


def flipped_strided_pads(length: int, k: int, stride: int) -> tuple[int, int]:
    """Explicit (lo, hi) padding that makes a strided conv with TAP-REVERSED
    weights compute the mirror image of the torch-SAME strided conv:
    out'[i] = SAME(flip(x), w)[i] == conv(x, rev w, pads)[N-1-i].

    Derivation: SAME uses lo = k//2 and N = floor((L + 2*lo - k)/s) + 1
    outputs; matching index algebra gives lo' = k - lo - L + s*(N-1) and
    hi' = lo (out count preserved). For stride 1 this degenerates to the
    symmetric (k//2, k//2) — flips are free on stride-1 SAME convs."""
    lo = k // 2
    n_out = (length + 2 * lo - k) // stride + 1
    lo2 = k - lo - length + stride * (n_out - 1)
    return lo2, lo


def pack_strided_conv_weights(w: jax.Array, factors=(F, F),
                              lo_y: int | None = None,
                              lo_x: int | None = None) -> jax.Array:
    """(kz, ky, kx, Cin, Cout) with original strides (sz, 2, 2) -> packed
    weight (kz, kyp, kxp, P*Cin, Cout): output lands on packed cell origins.
    lo_y/lo_x: original-axis left pads (default torch-SAME k//2)."""
    fy, fx = int(factors[0]), int(factors[1])
    kz, ky, kx, cin, cout = w.shape
    kyp, ty = _phase_tap_table_strided(ky, fy, lo_y)
    kxp, tx = _phase_tap_table_strided(kx, fx, lo_x)
    wp = jnp.zeros((kz, kyp, kxp, fy, fx, cin, cout), w.dtype)
    for dy in range(ky):
        oy, py = int(ty[dy, 0]), int(ty[dy, 1])
        for dx in range(kx):
            ox, px = int(tx[dx, 0]), int(tx[dx, 1])
            wp = wp.at[:, oy, ox, py, px, :, :].set(w[:, dy, dx, :, :])
    return wp.reshape(kz, kyp, kxp, fy * fx * cin, cout)


def strided_conv_geometry(x_shape, w_shape, z_stride: int, factors,
                          flip=()):
    """(lo_z, hi_z, lo_y, lo_x) padding geometry of packed_strided_conv3d for
    a packed input of `x_shape` — shared by the inline path and the
    prepare-outside-the-tile-loop path so they cannot diverge."""
    fy, fx = int(factors[0]), int(factors[1])
    kz, ky, kx = w_shape[:3]
    lz = int(x_shape[1])
    ly = int(x_shape[2]) * fy
    lx = int(x_shape[3]) * fx
    lo_z, hi_z = ((kz // 2, kz - 1 - kz // 2) if 0 not in flip
                  else flipped_strided_pads(lz, kz, z_stride))
    lo_y = ky // 2 if 1 not in flip else flipped_strided_pads(ly, ky, 2)[0]
    lo_x = kx // 2 if 2 not in flip else flipped_strided_pads(lx, kx, 2)[0]
    return lo_z, hi_z, lo_y, lo_x


def _packout_strided_weights(wp: jax.Array, out_factors, cout: int,
                             cell_strides=(1, 1)) -> jax.Array:
    """Extend a packed strided-conv weight [kz, kyp, kxp, P*Cin, Cout] so the
    conv emits the NEXT stage's packing directly: output phase (qy, qx) is
    the strided output at original offset (qy, qx), i.e. the same taps
    shifted by q packed cells — so the phase-q copy of the weight sits at
    tap offset +q with its own output-lane block (phase-major (qy, qx, c),
    matching space_to_depth_yx). The conv then runs with out_f-times the
    cell stride and out_f-1 extra taps per packed-out axis.

    Why: the stage0->1 strided conv emitted unpacked C=60 (47% MXU N fill,
    24 TFLOP/s measured) followed by a separate space-to-depth; emitting the
    (1,2)-packed 120 lanes directly doubles the N fill and deletes the
    repack copy."""
    ofy, ofx = int(out_factors[0]), int(out_factors[1])
    sy, sx = cell_strides  # packed-cell step per original output step
    kz_, kyp, kxp = wp.shape[:3]
    wpp = jnp.zeros((kz_, kyp + (ofy - 1) * sy, kxp + (ofx - 1) * sx,
                     wp.shape[3], ofy * ofx * cout), wp.dtype)
    for qy in range(ofy):
        for qx in range(ofx):
            q = qy * ofx + qx
            wpp = wpp.at[:, qy * sy:qy * sy + kyp, qx * sx:qx * sx + kxp, :,
                         q * cout:(q + 1) * cout].set(wp)
    return wpp


def prepare_packed_strided_conv3d(w: jax.Array, x_shape, *, z_stride: int = 2,
                                  factors=(F, F), flip=(), out_factors=None):
    """Precompute the packed strided-conv weight (a scatter-build kLoop
    fusion when left inside a tile loop) for apply via the prepared= arg.
    out_factors: also bake the NEXT stage's packing into the output lanes
    (see _packout_strided_weights); pass the same value to apply."""
    lo_z, hi_z, lo_y, lo_x = strided_conv_geometry(x_shape, w.shape, z_stride,
                                                   factors, flip)
    wp = pack_strided_conv_weights(w, factors, lo_y, lo_x)
    if out_factors is not None and tuple(out_factors) != (1, 1):
        wp = _packout_strided_weights(
            wp, out_factors, w.shape[4],
            cell_strides=(2 // int(factors[0]), 2 // int(factors[1])))
    return wp


def packed_strided_conv3d(x_packed: jax.Array, w: jax.Array, *,
                          z_stride: int = 2, factors=(F, F),
                          precision=None, flip=(),
                          prepared=None, out_factors=None) -> jax.Array:
    """Conv with strides (z_stride, 2, 2) over the ORIGINAL grid, input packed
    by `factors`, output UNPACKED: (N, Z/sz, Y/2, X/2, Cout) — or packed by
    `out_factors`: (N, Z/sz, Y/2/ofy, X/2/ofx, ofy*ofx*Cout), phase-major,
    equal to space_to_depth_yx(unpacked output, out_factors). nnU-Net's first
    strided conv of the next stage; SAME (torch symmetric) padding semantics.

    flip: spatial axes (0=z, 1=y, 2=x) executing in mirror-TTA weight-flip
    mode: `w` must arrive TAP-REVERSED on those axes and the padding switches
    to the flipped-world asymmetric pads (flipped_strided_pads), so the output
    equals flip(packed_strided(flip(x), w)) without any activation flips.
    Output phases index the UNFLIPPED frame (flipw never flips activations),
    so out_factors composes with flip unchanged.

    prepared: prepare_packed_strided_conv3d output built with the SAME
    out_factors (w still supplies the kernel extents)."""
    fy, fx = int(factors[0]), int(factors[1])
    ofy, ofx = ((1, 1) if out_factors is None
                else (int(out_factors[0]), int(out_factors[1])))
    kz = w.shape[0]
    lo_z, hi_z, lo_y, lo_x = strided_conv_geometry(
        x_packed.shape, w.shape, z_stride, factors, flip)
    if prepared is not None:
        wp = prepared
    else:
        wp = pack_strided_conv_weights(w, factors, lo_y, lo_x)
        if (ofy, ofx) != (1, 1):
            wp = _packout_strided_weights(wp, (ofy, ofx), w.shape[4],
                                          cell_strides=(2 // fy, 2 // fx))
    kyp, kxp = wp.shape[1], wp.shape[2]
    # left pad in packed cells = -o_min of the tap table (original tap -lo
    # lands in packed cell floor(-lo / f)); right pad fills the packed kernel
    # (incl. the out_factors phase extension)
    pady_l = -((-lo_y) // fy)
    padx_l = -((-lo_x) // fx)
    pad = ((lo_z, hi_z),
           (pady_l, kyp - 1 - pady_l),
           (padx_l, kxp - 1 - padx_l))
    return lax.conv_general_dilated(
        x_packed, wp,
        window_strides=(z_stride, (2 // fy) * ofy, (2 // fx) * ofx),
        padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision=precision)


# ---------------------------------------------------------------------------
# transposed conv: unpacked input -> packed output (decoder upsampling)
# ---------------------------------------------------------------------------

def prepare_packed_conv_transpose3d(w: jax.Array, *, z_stride: int = 2,
                                    factors=(F, F)):
    """Precompute the per-tap pointwise kernels of packed_conv_transpose3d
    (tiny transposes/reshapes, hoisted out of tile loops with the rest)."""
    fy, fx = int(factors[0]), int(factors[1])
    kz, ky, kx, cin, cout = w.shape
    assert kz == z_stride and ky == 2 and kx == 2, (w.shape, z_stride)
    wf = w[::-1, ::-1, ::-1]
    ny = 1 if fy == 2 else ky
    nx = 1 if fx == 2 else kx
    p = fy * fx
    kerns = []
    for iz in range(kz):
        for iy in range(ny):
            for ix in range(nx):
                sub = wf[iz]
                sub = sub if fy == 2 else sub[iy:iy + 1]
                sub = sub if fx == 2 else sub[:, ix:ix + 1]
                kerns.append(sub.transpose(2, 0, 1, 3).reshape(cin, p * cout))
    return kerns


def packed_conv_transpose3d(x: jax.Array, w: jax.Array, *,
                            z_stride: int = 2, factors=(F, F),
                            precision=None, prepared=None) -> jax.Array:
    """Transposed conv, kernel==stride==(z_stride,2,2), unpacked input
    (N, Z, Y', X', Cin) -> output packed by `factors`:
    (N, Z*sz, Y'*2/fy, X'*2/fx, P*Cout).

    Because kernel==stride, each output voxel receives exactly one tap. On
    packed axes the tap index becomes the output phase; on factor-1 axes (and
    z) outputs of the per-tap pointwise products interleave. flax ConvTranspose
    (transpose_kernel=False) mirrors the kernel — output position phase q
    receives tap k-1-q on every axis (verified against nn.ConvTranspose with a
    delta input) — hence the [::-1] flips."""
    fy, fx = int(factors[0]), int(factors[1])
    kz, ky, kx, cin, cout = w.shape
    assert kz == z_stride and ky == 2 and kx == 2, (w.shape, z_stride)
    ny = 1 if fy == 2 else ky  # interleave counts on non-packed axes
    nx = 1 if fx == 2 else kx
    kerns = (prepared if prepared is not None
             else prepare_packed_conv_transpose3d(w, z_stride=z_stride,
                                                  factors=factors))
    kit = iter(kerns)

    def pointwise(kern):
        return lax.conv_general_dilated(
            x, kern[None, None, None], window_strides=(1, 1, 1),
            padding="VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=precision)

    outs = [[[pointwise(next(kit)) for ix in range(nx)] for iy in range(ny)]
            for iz in range(kz)]
    n, z, yp, xp, pc = outs[0][0][0].shape
    # interleave x (axis 3), then y (axis 2), then z (axis 1)
    rows = [[jnp.stack(o_iy, axis=4).reshape(n, z, yp, xp * nx, pc)
             if nx > 1 else o_iy[0] for o_iy in o_iz] for o_iz in outs]
    planes = [jnp.stack(r, axis=3).reshape(n, z, yp * ny, xp * nx, pc)
              if ny > 1 else r[0] for r in rows]
    if kz > 1:
        return jnp.stack(planes, axis=2).reshape(n, z * kz, yp * ny, xp * nx, pc)
    return planes[0]


def prepare_packed_pointwise_conv3d(w: jax.Array, factors=(F, F)):
    """Block-diagonal [P*Cin, P*Cout] weight for the flat pointwise path
    (a small scatter build — hoist out of tile loops with the rest)."""
    cin, cout = w.shape[3], w.shape[4]
    p = nphases(factors)
    wb = jnp.zeros((p * cin, p * cout), w.dtype)
    for ph in range(p):
        wb = wb.at[ph * cin:(ph + 1) * cin,
                   ph * cout:(ph + 1) * cout].set(w[0, 0, 0])
    return wb


def packed_pointwise_conv3d(x_packed: jax.Array, w: jax.Array, b=None, *,
                            factors=(F, F), precision=None,
                            flat: bool | None = None,
                            prepared=None) -> jax.Array:
    """1x1x1 conv in packed space (e.g. seg heads): (..., P*Cin) -> (..., P*Cout).

    On TPU this runs as ONE flat dot with a block-diagonal [P*Cin, P*Cout]
    weight: the phase-grouped einsum's (..., P, C) reshape of the big tensor
    is not lane-tile aligned and materializes a full relayout copy of the
    result (~2.7 ms per b2 flagship head, v5e xprof round 4 copy.4324/4337).
    The block-diagonal zeros cost P x the FLOPs of the grouped einsum, but a
    1x1 head's FLOPs are tiny next to that copy (and the extra products are
    exact zeros, so the sums are unchanged). Off TPU (FLOP-bound) the
    phase-grouped reshape+einsum stays."""
    kz, ky, kx, cin, cout = w.shape
    assert (kz, ky, kx) == (1, 1, 1)
    p = nphases(factors)
    n, z, yp, xp, pc = x_packed.shape
    if flat is None:
        flat = jax.default_backend() == "tpu"
    if prepared is not None or (flat and p > 1):
        wb = (prepared if prepared is not None
              else prepare_packed_pointwise_conv3d(w, factors))
        out = jnp.einsum("nzyxk,ko->nzyxo", x_packed, wb.astype(x_packed.dtype),
                         precision=precision)
    else:
        xg = x_packed.reshape(n, z, yp, xp, p, cin)
        out = jnp.einsum("nzyxpi,io->nzyxpo", xg, w[0, 0, 0],
                         precision=precision)
        out = out.reshape(n, z, yp, xp, p * cout)
    if b is not None:
        out = out + b
    return out


# ---------------------------------------------------------------------------
# packed InstanceNorm statistics
# ---------------------------------------------------------------------------

def channel_stats(x_packed: jax.Array) -> jax.Array:
    """Per-sample per-(packed-)channel sum and sum of squares: (N, 2, PC).
    Same convention as the stats output of pallas_conv3d_same_affine."""
    xf = x_packed.astype(jnp.float32)
    axes = tuple(range(1, x_packed.ndim - 1))
    return jnp.stack([jnp.sum(xf, axis=axes),
                      jnp.sum(xf * xf, axis=axes)], axis=1)


def stats_affine(stats: jax.Array, scale: jax.Array, bias: jax.Array, *,
                 factors=(F, F), nvox: int, eps: float = 1e-5):
    """Instance-norm affine from precomputed channel stats.

    stats: (N, 2, P*C) sum/sumsq per packed channel (phase-major groups);
    scale/bias: per ORIGINAL channel (C,); nvox: packed spatial voxels
    (Z * Y' * X'). Returns per-sample (scale_pc, shift_pc), each (N, P*C),
    such that x * scale_pc + shift_pc == instance_norm(x) * scale + bias with
    statistics over the original spatial dims (all phases of a channel)."""
    p = nphases(factors)
    n = stats.shape[0]
    c = stats.shape[-1] // p
    s = stats.reshape(n, 2, p, c)
    denom = float(p * nvox)
    mean = jnp.sum(s[:, 0], axis=1) / denom                      # (N, C)
    var = jnp.sum(s[:, 1], axis=1) / denom - mean * mean
    sc = scale.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    sh = bias.astype(jnp.float32) - mean * sc
    return jnp.tile(sc, (1, p)), jnp.tile(sh, (1, p))


def normalize_from_stats(x_packed: jax.Array, stats: jax.Array,
                         scale: jax.Array, bias: jax.Array, *,
                         factors=(F, F), eps: float = 1e-5,
                         negative_slope: float | None = None) -> jax.Array:
    """packed_instance_norm given precomputed stats — elementwise only, no
    reduction pass over the activation."""
    nvox = int(np.prod(x_packed.shape[1:-1]))
    sc, sh = stats_affine(stats, scale, bias, factors=factors, nvox=nvox,
                          eps=eps)
    bshape = (x_packed.shape[0],) + (1,) * (x_packed.ndim - 2) + (-1,)
    out = x_packed.astype(jnp.float32) * sc.reshape(bshape) + sh.reshape(bshape)
    # cast before the activation, matching InstanceNorm -> leaky_relu in blocks.py
    out = out.astype(x_packed.dtype)
    if negative_slope is not None:
        out = _leaky_relu(out, negative_slope)
    return out


def _leaky_relu(y, slope):
    """max(y, y*slope): bitwise-identical to where(y>=0, y, y*slope) for
    0<slope<1, but a single VPU op instead of compare+select — fuses better
    with the surrounding normalize/cast chain."""
    return jnp.maximum(y, y * slope)


def packed_instance_norm(x_packed: jax.Array, scale: jax.Array,
                         bias: jax.Array, *, factors=(F, F), eps: float = 1e-5,
                         negative_slope: float | None = None) -> jax.Array:
    """InstanceNorm over the ORIGINAL spatial dims of a packed tensor: stats
    reduce over (Z, Y', X') and the phase groups, per original channel; scale/
    bias are per original channel (C,). Optionally fuses LeakyReLU."""
    p = nphases(factors)
    n, z, yp, xp, pc = x_packed.shape
    c = pc // p
    # single pass: sum and sumsq reduce together (same producer, one fused
    # sweep) where the mean-then-centered-var form costs TWO full reads of
    # the activation (2x ~350 ms per flagship volume on v5e, xprof). Post-conv
    # activations are O(1), so E[x^2] - mean^2 cancellation is benign in f32.
    #
    # The big tensor is never reshaped: a (.., P, c) split of the packed
    # channel dim is not lane-tile aligned for c % 128 != 0 and materialized
    # as a full f32 relayout copy (~0.5 GB per stage-1 site, v5e HLO). Reduce
    # per PACKED channel first, pool the tiny (N, P*c) stats across phases,
    # and tile the affine back to packed channels instead.
    x32 = x_packed.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=(1, 2, 3))                            # (N, P*c)
    s2 = jnp.sum(x32 * x32, axis=(1, 2, 3))
    nvox = float(z * yp * xp * p)
    mean = jnp.sum(s1.reshape(n, p, c), axis=1) / nvox           # (N, C)
    ex2 = jnp.sum(s2.reshape(n, p, c), axis=1) / nvox
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    sc = scale.astype(jnp.float32) * lax.rsqrt(var + eps)        # (N, C)
    sh = bias.astype(jnp.float32) - mean * sc
    sc_pc = jnp.tile(sc, (1, p))[:, None, None, None, :]         # (N,1,1,1,PC)
    sh_pc = jnp.tile(sh, (1, p))[:, None, None, None, :]
    out = x32 * sc_pc + sh_pc
    # cast before the activation, matching InstanceNorm -> leaky_relu in blocks.py
    out = out.astype(x_packed.dtype)
    if negative_slope is not None:
        out = _leaky_relu(out, negative_slope)
    return out
