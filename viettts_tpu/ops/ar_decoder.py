"""Fused autoregressive acoustic-decoder loop as a Pallas TPU kernel.

The acoustic model's inference decode is strictly sequential: frame t's
prenet consumes frame t-1's mel.  In XLA this is a `lax.scan` whose step
dispatches ~8 small matmuls with scheduling gaps between them
(~5.5 us/frame at B=1 on v5e).  This kernel runs the whole loop on-core:

* all decoder weights (prenet, both LSTMs' recurrent+prenet projections,
  mel projection) stay resident in VMEM for the entire sequence;
* each LSTM layer's gate contributions run as ONE merged MXU pass
  (``[p, h] @ [Wp; Wh]``) instead of 2-3 separate matvecs — at B=1 the
  sequential loop is per-op-latency bound, so fewer/wider dots beat the
  same MACs split across more issues (5 dots/frame vs 8);
* the precomputed conditioning gates (cond @ W, see
  AcousticModel.inference) and the prenet dropout keep-masks stream in
  chunk-by-chunk through the pipelined grid (Pallas double-buffers the
  next chunk's DMA behind the current chunk's compute);
* LSTM state and the fed-back mel frame live in VMEM scratch, which
  persists across the sequential TPU grid steps.

Semantics identical to the `lax.scan` path in
:meth:`viettts_tpu.models.acoustic.AcousticModel.inference` (same gate
math, same dropout masking); verified in tests/test_ar_decoder.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 64
# VMEM the streamed per-chunk buffers may use (double-buffered gate +
# keep-mask + output chunks).  Calibrated empirically on v5e at the real
# model dims (H=512, P=256, D=80; resident weights ~16.7 MB): ~10 MB of
# stream (~26.5 MB total) compiles for every probed batch (4/8/16/32),
# while ~20 MB of stream (~36 MB total) makes the Mosaic compile fail.
STREAM_BUDGET_BYTES = 10 * 1024 * 1024


def pick_chunk(B: int, H: int, P: int, D: int, L: int) -> Optional[int]:
    """Largest chunk (<= CHUNK, power of two, >= 8) whose double-buffered
    streams fit STREAM_BUDGET_BYTES; None if even chunk=8 does not fit
    (fall back to the lax.scan decode)."""
    per_frame = B * (2 * 4 * H + 2 * P + 2 * D) * 4  # g1c+g2c, keeps, out
    chunk = CHUNK
    while chunk >= 8:
        if 2 * chunk * per_frame <= STREAM_BUDGET_BYTES and L % chunk == 0:
            return chunk
        chunk //= 2
    return None


def _ar_kernel(
    g1c_ref,  # VMEM [CHUNK, B, 4H] conditioning gates, layer 1
    g2c_ref,  # VMEM [CHUNK, B, 4H] conditioning gates, layer 2
    keep1_ref,  # VMEM [CHUNK, B, P] prenet dropout keep mask 1 (f32 0/1)
    keep2_ref,  # VMEM [CHUNK, B, P]
    k_fc1_ref,  # VMEM [D, P]
    k_fc2_ref,  # VMEM [P, P]
    w1m_ref,  # VMEM [P + H, 4H]   rows: [w1_p; wh1]
    w2m_ref,  # VMEM [P + 2H, 4H]  rows: [w2_p; w2_h1; wh2]
    wp_ref,  # VMEM [2H, D] mel projection (both halves)
    pb_ref,  # VMEM [1, D] projection bias
    out_ref,  # VMEM [CHUNK, B, D]
    state_ref,  # scratch VMEM [4, B, H]  (h1, c1, h2, c2)
    mel_ref,  # scratch VMEM [B, D]
    *,
    H: int,
    scale: float,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        state_ref[...] = jnp.zeros_like(state_ref)
        mel_ref[...] = jnp.zeros_like(mel_ref)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def step(t, _):
        prev_mel = mel_ref[...]
        h1 = state_ref[0]
        c1 = state_ref[1]
        h2 = state_ref[2]
        c2 = state_ref[3]

        # prenet with always-on dropout (masks precomputed outside)
        p = jnp.maximum(dot(prev_mel, k_fc1_ref[...]), 0.0)
        p = p * keep1_ref[t] * scale
        p = jnp.maximum(dot(p, k_fc2_ref[...]), 0.0)
        p = p * keep2_ref[t] * scale

        def lstm(gates, h, c):
            gi = gates[:, :H]
            gg = gates[:, H : 2 * H]
            gf = gates[:, 2 * H : 3 * H]
            go = gates[:, 3 * H :]
            f = jax.nn.sigmoid(gf + 1.0)
            c_new = f * c + jax.nn.sigmoid(gi) * jnp.tanh(gg)
            h_new = jax.nn.sigmoid(go) * jnp.tanh(c_new)
            return h_new, c_new

        # One merged MXU pass per LSTM layer instead of 2 (layer 1) and 3
        # (layer 2) separate matvecs: dot([p, h], [Wp; Wh]) issues the
        # same bf16 products as the split dots (identical operand
        # rounding; only the f32 accumulation grouping differs), so the
        # merge is recurrence-safe while removing three per-frame MXU
        # issues from the sequential critical path.
        gates1 = g1c_ref[t] + dot(
            jnp.concatenate([p, h1], axis=1), w1m_ref[...]
        )
        h1n, c1n = lstm(gates1, h1, c1)
        gates2 = g2c_ref[t] + dot(
            jnp.concatenate([p, h1n, h2], axis=1), w2m_ref[...]
        )
        h2n, c2n = lstm(gates2, h2, c2)

        mel = dot(jnp.concatenate([h1n, h2n], axis=-1), wp_ref[...]) + pb_ref[...]

        state_ref[0] = h1n
        state_ref[1] = c1n
        state_ref[2] = h2n
        state_ref[3] = c2n
        mel_ref[...] = mel
        out_ref[t] = mel
        return 0

    jax.lax.fori_loop(0, out_ref.shape[0], step, 0)


def ar_decode(
    g1c: jax.Array,  # [B, L, 4H]
    g2c: jax.Array,  # [B, L, 4H]
    keep1: jax.Array,  # [L, B, P] bool
    keep2: jax.Array,  # [L, B, P] bool
    k_fc1: jax.Array,  # [D, P]
    k_fc2: jax.Array,  # [P, P]
    w1_p: jax.Array,  # [P, 4H]
    wh1: jax.Array,  # [H, 4H]
    w2_p: jax.Array,  # [P, 4H]
    w2_h1: jax.Array,  # [H, 4H]
    wh2: jax.Array,  # [H, 4H]
    proj_kernel: jax.Array,  # [2H, D]
    proj_bias: jax.Array,  # [D]
    dropout_scale: float,
    *,
    chunk: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused AR decode; returns mel frames [B, L, D] (pre-postnet)."""
    B, L, H4 = g1c.shape
    H = H4 // 4
    D = proj_kernel.shape[1]
    P = k_fc2.shape[0]
    if chunk is None:
        chunk = pick_chunk(B, H, P, D, L)
    if chunk is None:
        raise ValueError(
            f"no VMEM-feasible chunk for B={B}, H={H} — use the scan decode"
        )
    if L % chunk != 0:
        raise ValueError(f"n_frames {L} must be a multiple of chunk {chunk}")

    g1c_t = jnp.swapaxes(g1c, 0, 1)  # [L, B, 4H]
    g2c_t = jnp.swapaxes(g2c, 0, 1)
    keep1 = keep1.astype(jnp.float32)
    keep2 = keep2.astype(jnp.float32)
    # merged per-layer gate weights (see _ar_kernel): free at trace time,
    # XLA materializes them once
    w1m = jnp.concatenate([w1_p, wh1], axis=0)  # [P+H, 4H]
    w2m = jnp.concatenate([w2_p, w2_h1, wh2], axis=0)  # [P+2H, 4H]

    kernel = partial(_ar_kernel, H=H, scale=float(dropout_scale))

    def chunk_spec(width):
        return pl.BlockSpec(
            (chunk, B, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(L // chunk,),
        in_specs=[
            chunk_spec(4 * H),
            chunk_spec(4 * H),
            chunk_spec(P),
            chunk_spec(P),
            full(), full(), full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec(
            (chunk, B, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, B, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, B, H), jnp.float32),
            pltpu.VMEM((B, D), jnp.float32),
        ],
        interpret=interpret,
    )(
        g1c_t, g2c_t, keep1, keep2,
        k_fc1, k_fc2, w1m, w2m,
        proj_kernel, proj_bias.reshape(1, D),
    )
    return jnp.swapaxes(out, 0, 1)  # [B, L, D]
