"""Fused multi-receptive-field (MRF) resblock stack as a Pallas TPU kernel.

The HiFi-GAN generator spends almost all its time in the per-stage MRF:
3 ResBlocks (kernel sizes 3/7/11, dilations 1/3/5), each 6 stride-1 convs,
averaged.  Two structural problems make the XLA version slow:

1. every intermediate round-trips through HBM (36 tensor reads+writes per
   stage), and
2. the upper stages are *narrow* (64/32 channels) — a [L, 32] @ [32, 32]
   contraction uses 1/16th of the 128-wide MXU.

This kernel fixes both:

* **Space-to-depth packing**: for C < 128 channels, ``g = 128 // C``
  consecutive timesteps are packed into one 128-lane row.  Each dilated
  conv then becomes a small set of *dense* [rows, 128] @ [128, 128]
  matmuls: packed weight matrices ``A_q`` (one per packed-row offset q)
  assemble the original taps into (r, j) channel blocks.  Full MXU
  utilization at every stage.
* **VMEM residency**: the grid runs over (batch, time tiles); a tile is
  DMA'd in once with a halo, flows through all 18 convs in VMEM, and the
  resblock average is written once.  Packed weight matrices are streamed
  from HBM per conv into a small scratch slot.
* All slice offsets are static; in-buffer zero padding lets edge garbage
  spread inward by each conv's reach — the halo is sized so it never
  touches the written center.

Weights come in per resblock as W1 [D, k, C, C] (dilated convs),
B1 [D, C], W2 [D, k, C, C] (dilation-1 convs), B2 [D, C], in the (W, I, O)
layout of :class:`viettts_tpu.models.hifigan.WNConv`.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import List, Optional, Sequence, Tuple


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1
LANES = 128


def _lrelu(x):
    return jnp.where(x > 0, x, LRELU_SLOPE * x)


# ---------------------------------------------------------------------------
# Packed-conv construction (host/trace side).
# ---------------------------------------------------------------------------


def _pack_offsets(k: int, d: int, g: int) -> Tuple[List[int], List[Tuple[int, int, int, int]]]:
    """For a conv (kernel k, dilation d) on g-packed rows, list the packed
    row offsets q and the (q, t, r, j) placements: output block j at row m
    reads input block r at row m+q through tap t."""
    c = (k - 1) // 2
    placements = []
    offsets = set()
    for j in range(g):
        for t in range(k):
            s = j + (t - c) * d
            q, r = divmod(s, g)  # python floor-divmod (negatives ok)
            placements.append((q, t, r, j))
            offsets.add(q)
    return sorted(offsets), placements


def _pack_matrices(
    w: jax.Array, k: int, d: int, g: int, C: int, C_out: Optional[int] = None
):
    """Assemble packed weight matrices A [nq, g*C, g*C_out] from
    w [k, C, C_out] (C_out defaults to C for the square MRF convs)."""
    C_out = C if C_out is None else C_out
    offsets, placements = _pack_offsets(k, d, g)
    qindex = {q: i for i, q in enumerate(offsets)}
    A = jnp.zeros((len(offsets), g * C, g * C_out), jnp.float32)
    for (q, t, r, j) in placements:
        A = A.at[
            qindex[q], r * C : (r + 1) * C, j * C_out : (j + 1) * C_out
        ].add(w[t].astype(jnp.float32))
    return offsets, A


def _pack_transpose_matrices(
    w: jax.Array, bias: jax.Array, u: int, g_in: int, g_out: int
):
    """ConvTranspose1d (stride ``u``, SAME) as packed row matmuls.

    Input rows pack ``g_in`` positions of C_in channels (W_in lanes);
    output rows pack ``g_out`` positions of C_out channels (W_out lanes).
    One input row yields ``F = g_in*u/g_out`` output rows, so
    ``Y_chunk[i] = sum_o X[i+o] @ B_o`` followed by a
    [R, F*W_out] -> [R*F, W_out] reshape reproduces
    ``jax.lax.conv_transpose(..., padding="SAME")`` exactly.

    Derivation: jax SAME conv_transpose is a stride-1 correlation over the
    u-dilated input with leading pad ``pad_a`` (lax._conv_transpose_padding),
    so x[idx] through tap t lands at output n = idx*u + pad_a - t.

    Returns (offsets, B [no, W_in, F*W_out], bias_row [F*W_out], F).
    """
    k, C_in, C_out = w.shape
    assert (g_in * u) % g_out == 0
    F = (g_in * u) // g_out
    if u > k - 1:
        pad_a = k - 1
    else:
        pad_a = -(-(k + u - 2) // 2)  # ceil((k + u - 2) / 2)
    placements = []
    offsets = set()
    for r in range(g_in):
        for t in range(k):
            s = r * u + pad_a - t  # output position within the i=0 chunk
            qp, j = divmod(s, g_out)  # output row offset + intra-row block
            oq, f = divmod(qp, F)  # chunk offset + row within chunk
            o = -oq  # X[i + o] feeds chunk i
            placements.append((o, t, r, f, j))
            offsets.add(o)
    offsets = sorted(offsets)
    qindex = {o: i for i, o in enumerate(offsets)}
    W_in = g_in * C_in
    W_out_f = F * g_out * C_out
    B = jnp.zeros((len(offsets), W_in, W_out_f), jnp.float32)
    for (o, t, r, f, j) in placements:
        col = (f * g_out + j) * C_out
        B = B.at[
            qindex[o], r * C_in : (r + 1) * C_in, col : col + C_out
        ].add(w[t].astype(jnp.float32))
    bias_row = jnp.tile(bias.astype(jnp.float32), F * g_out)
    return offsets, B, bias_row, F


def _conv_radius_rows(k: int, d: int, g: int) -> int:
    offsets, _ = _pack_offsets(k, d, g)
    return max(-offsets[0], offsets[-1])


def _stack_radius_rows(
    kernel_sizes, dilations, g: int, two_convs: bool = True
) -> int:
    """Worst-case reach (in packed rows) of one resblock's conv chain.
    ``two_convs=False`` models ResBlock2 (one conv per dilation,
    reference hifigan/model.py:54-74)."""
    r = 0
    for k, dils in zip(kernel_sizes, dilations):
        blk = 0
        for d in dils:
            blk += _conv_radius_rows(k, d, g)
            if two_convs:
                blk += _conv_radius_rows(k, 1, g)
        r = max(r, blk)
    return r


def _pick_tile_rows(rows: int, width: int, budget_bytes: int = 6 * 1024 * 1024) -> int:
    """Tile rows so ~8 live [tile, width] f32 buffers stay within
    ``budget_bytes`` (leaving room for the A matrices and the output
    block).  Resident-weight kernels pass a larger budget: the halo is
    recomputed per tile, so fewer/larger tiles amortize it (Hp=64 rows is
    12.5% extra compute at Tp=1024 but 3% at Tp=4096)."""
    budget = budget_bytes // (8 * width * 4)
    t = 1 << int(math.floor(math.log2(max(budget, 256))))
    t = min(t, 8192, rows)
    while t > 1 and rows % t != 0:
        t //= 2
    return t


# ---------------------------------------------------------------------------
# Kernel.
# ---------------------------------------------------------------------------


def _mrf_kernel(
    x_ref,  # ANY [B, rows_padded, W] (or [B, rows_in_padded, W_in] fused)
    a_all_ref,  # packed conv matrices [N, W, W]: VMEM when resident, ANY (streamed) otherwise
    bias_ref,  # VMEM [n_convs, W]
    *rest,  # (+ ups_b_ref, ups_bias_ref when fusing) out_ref + scratch
    conv_plan: Tuple,  # ((n_blocks)(per conv: (offsets tuple, a_start)))
    n_blocks: int,
    Tp: int,
    Hp: int,
    total_rows: int,
    ups_plan=None,  # (offsets tuple, F, P_in, P_in_buf) when fusing convT
    post_plan=None,  # offsets tuple when fusing lrelu+conv_post+tanh
    resident: bool = False,  # A-matrices fully VMEM-resident (no streaming)
    quantize: bool = False,  # int8 A-matrices + dynamic int8 activations
    static_scales: bool = False,  # calibrated act scales (no amax reduce)
):
    rest = list(rest)
    ups_b_ref = ups_bias_ref = post_b_ref = post_bias_ref = None
    sw_ref = inv_ref = None
    if quantize:
        sw_ref, rest = rest[0], rest[1:]
        if static_scales:
            inv_ref, rest = rest[0], rest[1:]
    if ups_plan is not None:
        ups_b_ref, ups_bias_ref = rest[:2]
        rest = rest[2:]
    if post_plan is not None:
        post_b_ref, post_bias_ref = rest[:2]
        rest = rest[2:]
    if resident:
        out_ref, buf_ref, sem_x = rest
        a_buf_ref = sem_a = None
    else:
        out_ref, buf_ref, a_buf_ref, sem_x, sem_a = rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    Pp = Tp + 2 * Hp
    W = a_all_ref.shape[-1]

    if ups_plan is None:
        dma = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(i * Tp, Pp), :], buf_ref, sem_x
        )
    else:
        _, _, _, P_in_buf = ups_plan
        T_in = Tp // ups_plan[1]
        dma = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(i * T_in, P_in_buf), :], buf_ref, sem_x
        )
    dma.start()
    dma.wait()

    # Rows of this buffer that lie inside the true sequence: buffer row t is
    # padded-global row i*Tp + t; valid iff Hp <= global < Hp + total_rows.
    # Each conv's SAME semantics zero-pads *intermediates* at the true
    # sequence edges, so outputs must be re-zeroed outside this range.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (Pp, 1), 0) + i * Tp
    valid = jnp.logical_and(row_ids >= Hp, row_ids < Hp + total_rows)

    # Flat conv order for double-buffered A-matrix streaming: the next
    # conv's packed matrices are prefetched while the current one computes.
    # In resident mode the whole A stack lives in VMEM for the kernel's
    # lifetime (copied in once before the first grid program), so every
    # (batch, tile) program reuses it — streaming re-fetched the identical
    # weights B*(rows/Tp) times, which dominated HBM traffic at large batch.
    # conv_plan[blk] is a tuple of residual units; each unit is a chain of
    # (offsets, a_start) convs (2 per unit for ResBlock1, 1 for ResBlock2).
    flat_plan = [
        conv
        for blk_plan in conv_plan
        for unit in blk_plan
        for conv in unit
    ]

    def a_copy(idx):
        offsets, start = flat_plan[idx]
        return pltpu.make_async_copy(
            a_all_ref.at[pl.ds(start, len(offsets))],
            a_buf_ref.at[idx % 2, pl.ds(0, len(offsets))],
            sem_a.at[idx % 2],
        )

    if not resident:
        a_copy(0).start()

    conv_counter = [0]

    def packed_conv(inp, offsets, start):
        """One packed conv: A matrices were prefetched (or resident); kick
        off the next conv's prefetch, then sum the q-matmuls."""
        idx = conv_counter[0]
        if not resident:
            if idx + 1 < len(flat_plan):
                a_copy(idx + 1).start()
            a_copy(idx).wait()
        slot = idx % 2
        qmin, qmax = offsets[0], offsets[-1]
        left = max(0, -qmin)
        right = max(0, qmax)
        if quantize and static_scales:
            # Calibrated per-conv activation scale: no amax reduce (a
            # cross-tile serialization point in the dynamic path), and the
            # dequant multiplier act_scale/127 is folded into sw on the
            # host.  Inputs beyond the calibrated range are clipped (the
            # dynamic path never clips; here the scale is fixed).
            inv = inv_ref[conv_counter[0], 0]
            inp = jnp.round(
                jnp.clip(inp * inv, -127.0, 127.0)
            ).astype(jnp.int8)
        elif quantize:
            # Dynamic per-tile symmetric int8 quantization of the conv
            # input: one scalar scale for the whole [Pp, W] tile keeps the
            # accumulation across q-offsets in int32 (a single dequant at
            # the end) — per-row scales would force a per-offset f32
            # dequant, whose VPU cost eats the int8 MXU win.  The MXU runs
            # int8 x int8 -> int32 at 2x the bf16 rate on v5e.  No clip is
            # needed: inv = 127/amax bounds |inp*inv| <= 127 (up to one
            # f32 ulp, absorbed by round-to-nearest), and the quantized
            # convs run at ~60% of int8 peak with the VPU quant passes on
            # the critical path — every elementwise op here is ~2% of a
            # stage.
            amax = jnp.max(jnp.abs(inp))
            inv = 127.0 / jnp.maximum(amax, 1e-30)
            inp = jnp.round(inp * inv).astype(jnp.int8)
        if left or right:
            xpad = jnp.concatenate(
                [
                    jnp.zeros((left, W), inp.dtype),
                    inp,
                    jnp.zeros((right, W), inp.dtype),
                ],
                axis=0,
            )
        else:
            xpad = inp
        # (A single deep-K dot per conv — [Pp, nq*W] @ [nq*W, W] built by
        # lane-concatenating the row-shifted views — was tried and is NOT
        # expressible: Mosaic rejects concatenating vectors whose sublane
        # offsets differ, "result/input offset mismatch on non-concat
        # dimension".  The per-offset dot chain below is the supported
        # form.)
        y = None
        for qi, q in enumerate(offsets):
            a_mat = (
                a_all_ref[start + qi] if resident else a_buf_ref[slot, qi]
            )
            if quantize:
                # int8 x int8 -> int32 MXU pass; accumulate in int32.
                contrib = jax.lax.dot_general(
                    jax.lax.slice(xpad, (q - qmin, 0), (q - qmin + Pp, W)),
                    a_mat,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            else:
                # All in-kernel math is f32: at jax's DEFAULT matmul
                # precision the MXU already rounds f32 dot operands to bf16
                # single-pass, so bf16 *compute* buys nothing — bf16 here
                # is a storage format (A-matrices + activation I/O), cast
                # f32 at the dot.
                contrib = jax.lax.dot_general(
                    jax.lax.slice(xpad, (q - qmin, 0), (q - qmin + Pp, W)),
                    a_mat.astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            y = contrib if y is None else y + contrib
        if quantize and static_scales:
            # sw already carries act_scale/127 (folded on the host).
            y = y.astype(jnp.float32) * sw_ref[conv_counter[0]]
        elif quantize:
            # Dequant: x = xi * (amax/127), A = Ai * sw[col] (per-column
            # weight scales) => y = intdot * (amax/127) * sw.
            y = y.astype(jnp.float32) * (
                (amax * (1.0 / 127.0)) * sw_ref[conv_counter[0]]
            )
        y = y + bias_ref[conv_counter[0]]
        conv_counter[0] += 1
        return jnp.where(valid, y, 0.0)

    if ups_plan is None:
        x = buf_ref[:].astype(jnp.float32)  # [Pp, W]
    else:
        # Fused leaky_relu + ConvTranspose: packed matmuls over the input
        # tile, then a [P_in, F*W] -> [Pp, W] row unpack.  Out-of-sequence
        # rows are re-zeroed (the bias would otherwise leak into the halo).
        ups_offsets, F, P_in, _ = ups_plan
        omin = ups_offsets[0]
        W_in = buf_ref.shape[-1]
        xin = _lrelu(buf_ref[:].astype(jnp.float32))
        # The ConvTranspose stays full-precision even under quantize: it
        # is ~3% of a stage's MACs but its output is the stage trunk that
        # every resblock reads, so quantizing it was measured to cost 5.5x
        # in waveform error (0.77% -> 4.2% rel RMS) for zero time win (the
        # margins here are VPU-bound, not MXU-bound).
        y = None
        for oi, o in enumerate(ups_offsets):
            contrib = jax.lax.dot_general(
                jax.lax.slice(xin, (o - omin, 0), (o - omin + P_in, W_in)),
                ups_b_ref[oi].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = contrib if y is None else y + contrib
        y = y + ups_bias_ref[0]
        x = jnp.where(valid, y.reshape(P_in * F, W), 0.0)
    acc = None
    for blk in range(n_blocks):
        r = x
        for unit in conv_plan[blk]:
            y = r
            for offsets, start in unit:
                y = packed_conv(_lrelu(y), offsets, start)
            r = y + r
        acc = r if acc is None else acc + r
    acc = acc / float(n_blocks)

    if post_plan is None:
        out_ref[0] = jax.lax.slice(acc, (Hp, 0), (Hp + Tp, W)).astype(
            out_ref.dtype
        )
        return

    # Epilogue: generator tail fused in — leaky_relu (torch-default 0.01
    # slope, reference hifigan/model.py:122) -> conv_post -> tanh.  The
    # [*, W] @ [W, g] matmuls are tiny; the win is skipping the HBM
    # round-trip and XLA's poor narrow-channel conv.
    z = jnp.where(acc > 0, acc, 0.01 * acc)
    z = jnp.where(valid, z, 0.0)
    qmin, qmax = post_plan[0], post_plan[-1]
    left, right = max(0, -qmin), max(0, qmax)
    if left or right:
        z = jnp.concatenate(
            [
                jnp.zeros((left, W), z.dtype),
                z,
                jnp.zeros((right, W), z.dtype),
            ],
            axis=0,
        )
    y = None
    for qi, q in enumerate(post_plan):
        contrib = jax.lax.dot_general(
            jax.lax.slice(z, (q - qmin, 0), (q - qmin + Pp, W)),
            post_b_ref[qi].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = contrib if y is None else y + contrib
    y = jnp.tanh(y + post_bias_ref[0])
    g_out = out_ref.shape[-1]
    out_ref[0] = jax.lax.slice(y, (Hp, 0), (Hp + Tp, g_out))


# ---------------------------------------------------------------------------
# Public entry.
# ---------------------------------------------------------------------------


def fused_mrf(
    x: jax.Array,
    weights: Sequence[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]],
    kernel_sizes: Sequence[int],
    dilations: Sequence[Sequence[int]],
    *,
    upsample: Optional[Tuple[jax.Array, jax.Array, int]] = None,
    post: Optional[Tuple[jax.Array, jax.Array]] = None,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    weights_dtype=None,
    io_dtype=None,
    resident_budget: int = 10 * 1024 * 1024,
    quantize_int8: bool = False,
    act_scales: Optional[jax.Array] = None,
) -> jax.Array:
    """Apply the fused (ConvTranspose +) MRF (+ conv_post) stack.

    Without ``upsample``: x is [B, L, C] (already upsampled).
    With ``upsample=(w [k, C_in, C], b [C], u)``: x is [B, L//u, C_in] and
    the kernel computes ``leaky_relu -> ConvTranspose(stride u, SAME) ->
    MRF`` in one pass, so the upsampled activation never round-trips
    through HBM (reference stage structure: hifigan/model.py:109-121).
    With ``post=(w [kp, C, C_post], b [C_post])`` the generator tail
    (leaky_relu(0.01) -> conv_post -> tanh, hifigan/model.py:121-124) is
    fused in as an epilogue and the result is [B, L, C_post] waveform.

    Returns [B, L, C] (or [B, L, C_post] f32 with ``post``).

    ``weights[blk] = (W1 [D,k,C,C], B1 [D,C], W2 [D,k,C,C], B2 [D,C])``.
    Requires 128 % C == 0 or C % 128 == 0 (likewise for C_in).

    ``compute_dtype=jnp.bfloat16`` selects bf16 **storage** for the packed
    A-matrices and the activation I/O (halving their HBM traffic and VMEM
    footprint); ``weights_dtype`` / ``io_dtype`` override each
    independently.  In-kernel math stays f32 — at jax's DEFAULT matmul
    precision the MXU already rounds f32 dot operands to bf16 single-pass
    (measured bit-identical on v5e), so bf16 arithmetic would add nothing,
    and the f32 residual chain keeps accumulation exact.  When the packed
    A-matrix stack fits ``resident_budget`` bytes it is kept fully
    VMEM-resident for the whole kernel instead of being
    double-buffer-streamed per conv — streaming re-fetched the identical
    weights once per (batch, tile) grid program, which at large batch
    dominated HBM traffic.

    ``quantize_int8=True`` stores the MRF packed A-matrices as int8 with
    per-output-column (= per original output channel) symmetric scales and
    quantizes each conv's input tile dynamically (one scalar scale per
    tile) inside the kernel, so every MRF conv runs as int8 x int8 -> int32
    MXU passes — 2x the bf16 matmul rate on v5e.  The residual chain, the
    resblock average, biases, and the (optional) fused ConvTranspose /
    conv_post stay in f32: only the 18 MRF convs are quantized (quantizing
    the ConvTranspose too was measured at 5.5x the waveform error for no
    speedup — see the kernel comment).

    ``act_scales`` (with ``quantize_int8``) supplies a calibrated per-conv
    input amax ([n_convs] in flat conv order, see
    ``generator_calibrate_int8``): activation quantization then uses the
    fixed scale (clipping above it) instead of a dynamic per-tile amax
    reduce, removing the reduce barrier from every conv.
    """
    kernel_sizes = tuple(kernel_sizes)
    dilations = tuple(tuple(d) for d in dilations)
    n_blocks = len(kernel_sizes)

    if upsample is not None:
        w_t, b_t, stride_u = upsample
        B, L_in, C_in = x.shape
        C = w_t.shape[2]
        L = L_in * stride_u
    else:
        B, L, C = x.shape

    g = max(1, LANES // C)
    if C < LANES and LANES % C != 0:
        raise ValueError(f"channels {C} must divide {LANES}")
    if C >= LANES and C % LANES != 0:
        raise ValueError(f"channels {C} must be a multiple of {LANES}")
    W = g * C
    if L % g != 0:
        raise ValueError(f"length {L} not divisible by packing {g}")
    rows = L // g

    compute_dtype = jnp.dtype(compute_dtype)
    default_store = (
        jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
    )
    a_dtype = jnp.dtype(weights_dtype or default_store)
    io_dtype = jnp.dtype(io_dtype or default_store)
    # Round the halo up to the dtype's sublane tile (8 rows for f32,
    # 16 for bf16) so DMA'd buffer heights stay aligned.  The conv_post
    # epilogue (when fused) reads the MRF output at +-its radius, so its
    # reach joins the stack radius.
    align = 8 * (4 // jnp.dtype(io_dtype).itemsize)
    two_convs = weights[0][2] is not None
    radius = _stack_radius_rows(kernel_sizes, dilations, g, two_convs)
    if post is not None:
        radius += _conv_radius_rows(post[0].shape[0], 1, g)
    Hp = -(-radius // align) * align

    # Build the packed conv matrices and the static plan.
    a_parts: List[jax.Array] = []
    biases: List[jax.Array] = []
    plan = []
    a_start = 0
    max_nq = 0
    for blk in range(n_blocks):
        k = kernel_sizes[blk]
        w1, b1, w2, b2 = weights[blk]
        blk_plan = []
        for j, d in enumerate(dilations[blk]):
            # ResBlock1 units are (dilated conv, dilation-1 conv);
            # ResBlock2 units (w2 is None) are a single dilated conv.
            chain = [(w1[j], b1[j], d)]
            if w2 is not None:
                chain.append((w2[j], b2[j], 1))
            unit = []
            for w_c, b_c, d_c in chain:
                offs, A = _pack_matrices(w_c, k, d_c, g, C)
                a_parts.append(A)
                biases.append(jnp.tile(b_c.astype(jnp.float32), g))
                unit.append((tuple(offs), a_start))
                a_start += len(offs)
                max_nq = max(max_nq, len(offs))
            blk_plan.append(tuple(unit))
        plan.append(tuple(blk_plan))

    sw_inputs: Tuple = ()
    if quantize_int8:
        # Per-conv, per-output-column symmetric quantization.  A column of
        # the packed matrix holds one (packed position, output channel)
        # pair, and the scale max runs over all q offsets, so this is
        # exactly per-output-channel quantization of the original conv.
        q_parts: List[jax.Array] = []
        sw_parts: List[jax.Array] = []
        for A in a_parts:
            s = jnp.maximum(jnp.max(jnp.abs(A), axis=(0, 1)), 1e-12) / 127.0
            q_parts.append(
                jnp.clip(jnp.round(A / s), -127.0, 127.0).astype(jnp.int8)
            )
            sw_parts.append(s.astype(jnp.float32))
        a_all = jnp.concatenate(q_parts, axis=0)  # [N, W, W] int8
        sw_stack = jnp.stack(sw_parts)  # [n_convs, W]
        if act_scales is not None:
            # Static calibrated activation scales (see
            # ``generator_calibrate_int8``): fold act_scale/127 into the
            # dequant weights and hand the kernel the quant multipliers,
            # so the dynamic amax reduce disappears from the conv chain.
            act = jnp.asarray(act_scales, jnp.float32).reshape(-1)
            if act.shape[0] != sw_stack.shape[0]:
                raise ValueError(
                    f"act_scales has {act.shape[0]} entries, stack has "
                    f"{sw_stack.shape[0]} convs"
                )
            act = jnp.maximum(act, 1e-12)
            sw_inputs = (
                sw_stack * (act[:, None] / 127.0),
                (127.0 / act)[:, None],  # [n_convs, 1] quant multipliers
            )
        else:
            sw_inputs = (sw_stack,)
    else:
        a_all = jnp.concatenate(a_parts, axis=0).astype(a_dtype)  # [N, W, W]
    bias_all = jnp.stack(biases)  # [n_convs, W] (biases stay f32)
    resident = a_all.size * a_all.dtype.itemsize <= resident_budget

    # Resident kernels spend no VMEM on streaming scratch and amortize the
    # halo better with larger tiles; streaming keeps the smaller budget.
    # 48 MB measured best per stage on v5e (B=16, T=768, bf16 —
    # scripts/profile_stage.py: stage1 20.95->19.86 ms, stage3
    # 21.60->20.28 ms vs 24 MB; 96 MB flat).  VIETTTS_MRF_TILE_MB
    # overrides for tuning sweeps.
    tile_mb = int(os.environ.get("VIETTTS_MRF_TILE_MB", "48"))
    Tp = _pick_tile_rows(
        rows, W,
        budget_bytes=tile_mb * 1024 * 1024 if resident else 6 * 1024 * 1024,
    )
    if rows % Tp != 0:
        raise ValueError(f"{rows} rows not divisible by tile {Tp}")
    if Tp % align != 0:
        raise ValueError(f"tile {Tp} not {align}-row aligned")

    ups_plan = None
    ups_inputs: Tuple = ()
    if upsample is not None:
        g_in = max(1, LANES // C_in)
        if C_in < LANES and LANES % C_in != 0:
            raise ValueError(f"in-channels {C_in} must divide {LANES}")
        if C_in >= LANES and C_in % LANES != 0:
            raise ValueError(f"in-channels {C_in} must be a multiple of {LANES}")
        W_in = g_in * C_in
        if L_in % g_in != 0:
            raise ValueError(f"input length {L_in} not divisible by {g_in}")
        rows_in = L_in // g_in
        ups_offsets, ups_B, ups_bias_row, F = _pack_transpose_matrices(
            w_t, b_t, stride_u, g_in, g
        )
        assert rows == rows_in * F, (rows, rows_in, F)
        if Hp % F != 0 or Tp % F != 0:
            raise ValueError(f"tile ({Tp}) / halo ({Hp}) not divisible by {F}")
        omin, omax = ups_offsets[0], ups_offsets[-1]
        T_in = Tp // F
        H_in = Hp // F
        P_in = T_in + 2 * H_in
        P_in_buf = (
            -(-(P_in + (omax - omin)) // align) * align
        )  # sublane-aligned DMA
        # Pad so the DMA window for tile i starts at padded row i*T_in and
        # the last tile's window stays in bounds.
        l_pad = H_in - omin
        r_pad = max(P_in_buf - T_in - l_pad, 0)
        xp = x.astype(io_dtype).reshape(B, rows_in, W_in)
        xp = jnp.pad(xp, ((0, 0), (l_pad, r_pad), (0, 0)))
        ups_plan = (tuple(ups_offsets), F, P_in, P_in_buf)
        ups_inputs = (ups_B.astype(a_dtype), ups_bias_row[None, :])
        buf_shape = (P_in_buf, W_in)
    else:
        xp = x.astype(io_dtype).reshape(B, rows, W)
        xp = jnp.pad(xp, ((0, 0), (Hp, Hp), (0, 0)))
        buf_shape = (Tp + 2 * Hp, W)

    post_plan = None
    post_inputs: Tuple = ()
    out_w = W
    C_out_final = C
    if post is not None:
        w_p, b_p = post
        kp = w_p.shape[0]
        C_post = w_p.shape[2]
        post_offs, post_A = _pack_matrices(w_p, kp, 1, g, C, C_post)
        post_plan = tuple(post_offs)
        post_inputs = (
            post_A.astype(a_dtype),
            jnp.tile(b_p.astype(jnp.float32), g)[None, :],
        )
        out_w = g * C_post
        C_out_final = C_post

    kernel = partial(
        _mrf_kernel,
        conv_plan=tuple(plan),
        n_blocks=n_blocks,
        Tp=Tp,
        Hp=Hp,
        total_rows=rows,
        ups_plan=ups_plan,
        post_plan=post_plan,
        resident=resident,
        quantize=quantize_int8,
        static_scales=quantize_int8 and act_scales is not None,
    )

    out_dtype = jnp.float32 if post is not None else io_dtype
    scratch_shapes = [pltpu.VMEM(buf_shape, io_dtype)]
    if not resident:
        scratch_shapes += [
            pltpu.VMEM((2, max_nq, W, W), a_all.dtype),
        ]
    scratch_shapes += [pltpu.SemaphoreType.DMA]
    if not resident:
        scratch_shapes += [pltpu.SemaphoreType.DMA((2,))]
    # The default XLA scoped-vmem limit (16 MB) is conservative — v5e has
    # far more physical VMEM — and the resident-A layout deliberately
    # trades VMEM for the HBM weight re-streaming it eliminates.  Ask for
    # what the kernel actually needs, with headroom for Mosaic temporaries.
    try:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    except AttributeError:  # pragma: no cover - older jax
        compiler_params = pltpu.TPUCompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        kernel,
        grid=(B, rows // Tp),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                memory_space=pltpu.VMEM if resident else pl.ANY
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (len(sw_inputs) + len(ups_inputs) + len(post_inputs)),
        out_specs=pl.BlockSpec(
            (1, Tp, out_w), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, rows, out_w), out_dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )(xp, a_all, bias_all, *sw_inputs, *ups_inputs, *post_inputs)
    return out.reshape(B, L, C_out_final)


def mrf_weights_from_params(params, stage: int, num_kernels: int):
    """Extract stacked MRF weights for one generator stage from a plain
    (use_wn=False) Generator params tree.  Handles both ResBlock1
    (``convs1_*/convs2_*``) and ResBlock2 (``convs_*``, w2/b2 = None)
    naming (reference hifigan/model.py:13-74)."""
    out = []
    for j in range(num_kernels):
        block = params[f"resblock_{stage * num_kernels + j}"]
        if any(k.startswith("convs1_") for k in block):
            n_dil = len([k for k in block if k.startswith("convs1_")])
            w1 = jnp.stack(
                [block[f"convs1_{i}"]["kernel"] for i in range(n_dil)]
            )
            b1 = jnp.stack(
                [block[f"convs1_{i}"]["bias"] for i in range(n_dil)]
            )
            w2 = jnp.stack(
                [block[f"convs2_{i}"]["kernel"] for i in range(n_dil)]
            )
            b2 = jnp.stack(
                [block[f"convs2_{i}"]["bias"] for i in range(n_dil)]
            )
            out.append((w1, b1, w2, b2))
        else:
            n_dil = len([k for k in block if k.startswith("convs_")])
            w1 = jnp.stack(
                [block[f"convs_{i}"]["kernel"] for i in range(n_dil)]
            )
            b1 = jnp.stack(
                [block[f"convs_{i}"]["bias"] for i in range(n_dil)]
            )
            out.append((w1, b1, None, None))
    return out
