"""Analytic FLOP counts for the three models — the roofline side of the
benchmark harness.

XLA's ``compiled.cost_analysis()`` cannot see inside Pallas custom calls
(the fused MRF / AR-decoder kernels report ~0 flops), so the benchmark
suite counts multiply-accumulates analytically from the model configs
(1 MAC = 2 FLOPs) and reports achieved TFLOP/s and model FLOPs
utilization (MFU) against the chip peaks.

Peaks (TPU v5e, per chip): 197 TFLOP/s bf16, 49.2 TFLOP/s f32.  At jax's
DEFAULT matmul precision the MXU runs f32 matmuls as single-pass bf16
(measured bit-identical on this chip — see ops/mrf.py), so **bf16 peak is
the honest roofline** for every path in this framework; the f32 figure is
reported for context.

Element-wise work (activations, norms, residual adds) is excluded — it
runs on the VPU and is not the resource MFU measures.
"""

from __future__ import annotations

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 49.2e12

PEAKS = {
    "tpu v5 lite": (V5E_BF16_PEAK, V5E_F32_PEAK),
    "tpu v5e": (V5E_BF16_PEAK, V5E_F32_PEAK),
}


def device_peaks(device=None):
    """(bf16_peak, f32_peak) FLOP/s for the given (default: first) device;
    falls back to v5e numbers on unknown platforms."""
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peaks in PEAKS.items():
        if key in kind:
            return peaks
    return V5E_BF16_PEAK, V5E_F32_PEAK


def _conv1d(L, c_in, c_out, k, batch=1):
    return 2 * batch * L * c_in * c_out * k


def _dense(n, d_in, d_out, batch=1):
    return 2 * batch * n * d_in * d_out


def _lstm_steps(n, d_in, hidden, batch=1):
    # 4 gates, input + recurrent matmuls per step
    return 2 * batch * n * 4 * hidden * (d_in + hidden)


def _encoder_flops(n_tokens, dim, batch=1):
    """TokenEncoder: 3 x Conv1D(k=3) + bi-LSTM (hidden=dim each way).
    The embedding lookup is a gather (no MACs)."""
    f = 3 * _conv1d(n_tokens, dim, dim, 3, batch)
    f += 2 * _lstm_steps(n_tokens, dim, dim, batch)  # fwd + bwd
    return f


def duration_flops(cfg, n_tokens, batch=1):
    """DurationModel: encoder + Dense(lstm_dim) + Dense(1)
    (models/duration.py; reference model.py:50-70)."""
    d = cfg.duration.lstm_dim
    f = _encoder_flops(n_tokens, d, batch)
    f += _dense(n_tokens, 2 * d, d, batch)
    f += _dense(n_tokens, d, 1, batch)
    return f


def acoustic_decode_flops(cfg, n_tokens, n_frames, batch=1):
    """AcousticModel.inference: encoder + Gaussian upsampling + per-frame
    AR decode (prenet, 2 skip-connected LSTMs, mel projection) + postnet
    (models/acoustic.py; reference model.py:73-144)."""
    a = cfg.acoustic
    enc_out = 2 * a.encoder_dim
    f = _encoder_flops(n_tokens, a.encoder_dim, batch)
    # upsampling attention: weights [L, T] plus context einsum [L,T]x[T,D]
    f += 2 * batch * n_frames * n_tokens * (1 + enc_out)
    # prenet (2 dense, no bias)
    f += _dense(n_frames, a.mel_dim, a.prenet_dim, batch)
    f += _dense(n_frames, a.prenet_dim, a.prenet_dim, batch)
    # decoder LSTMs: layer 1 eats [prenet, cond], layer 2 [h1, cond] (skip)
    f += _lstm_steps(n_frames, a.prenet_dim + enc_out, a.decoder_dim, batch)
    f += _lstm_steps(n_frames, a.decoder_dim + enc_out, a.decoder_dim, batch)
    # mel projection from [h2, cond]
    f += _dense(n_frames, a.decoder_dim + enc_out, a.mel_dim, batch)
    # postnet: mel->P, 3 x P->P, P->mel, k=5
    f += _conv1d(n_frames, a.mel_dim, a.postnet_dim, 5, batch)
    f += 3 * _conv1d(n_frames, a.postnet_dim, a.postnet_dim, 5, batch)
    f += _conv1d(n_frames, a.postnet_dim, a.mel_dim, 5, batch)
    return f


def generator_flops(cfg, n_frames, batch=1):
    """HiFi-GAN generator (models/hifigan.py; reference
    hifigan/model.py:77-125): conv_pre + per-stage ConvTranspose + MRF +
    conv_post.  Handles both resblock variants."""
    h = cfg if hasattr(cfg, "upsample_rates") else cfg.hifigan
    C0 = h.upsample_initial_channel
    L = n_frames
    f = _conv1d(L, h.mel_dim, C0, 7, batch)
    c_in = C0
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        c_out = C0 // (2 ** (i + 1))
        L *= u
        # ConvTranspose MACs = L_out * c_in * c_out * k / u (each output
        # sample sees ~k/u taps of the undilated input)
        f += 2 * batch * L * c_in * c_out * (k / u)
        convs_per_dil = 2 if h.resblock == "1" else 1
        for rk, rd in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
            f += len(rd) * convs_per_dil * _conv1d(L, c_out, c_out, rk, batch)
        c_in = c_out
    f += _conv1d(L, c_in, 1, 7, batch)
    return int(f)


def _transpose_offsets(k: int, u: int, g_in: int, g_out: int) -> tuple:
    """(n_offsets, F) for the packed ConvTranspose matmuls — mirrors the
    placement loop of ops.mrf._pack_transpose_matrices without building
    the matrices."""
    F = (g_in * u) // g_out
    if u > k - 1:
        pad_a = k - 1
    else:
        pad_a = -(-(k + u - 2) // 2)
    offsets = set()
    for r in range(g_in):
        for t in range(k):
            s = r * u + pad_a - t
            qp, _ = divmod(s, g_out)
            oq, _ = divmod(qp, F)
            offsets.add(-oq)
    return len(offsets), F


def generator_actual_flops(cfg, n_frames, batch=1):
    """MACs the fused serving path (generator_apply_fused) actually issues
    on the MXU, as opposed to the algorithmically-necessary count of
    :func:`generator_flops`.

    The Pallas MRF kernel space-to-depth-packs C<128 channels into
    128-lane rows and issues one dense [rows,128]@[128,128] matmul per
    packed-row offset.  Offsets grow with dilation*kernel/g, so the
    narrow stages (C=64: ~2.1x, C=32: ~2.9x) do structurally more MXU
    work than the algorithmic count — the price of keeping the 128-wide
    MXU fully fed (the alternative, unpacked narrow convs, idles
    (128-C)/128 of the array and measures slower; see ops/mrf.py).

    MFU against *this* count measures distance from the kernel's MXU
    roofline; MFU against :func:`generator_flops` measures how much of
    the paid compute is algorithmically necessary.  Stages routed to XLA
    are counted algorithmically.  On the int8 route
    (``inference_dtype="int8"``) wide 128-divisible stages (e.g. stage 0,
    C=256) also fuse, at g=1: their square MRF convs issue exactly the
    algorithmic MACs (no packing waste), the fused ConvTranspose issues
    its packed-offset count.
    """
    from viettts_tpu.ops.mrf import _pack_offsets

    h = cfg if hasattr(cfg, "upsample_rates") else cfg.hifigan
    int8_route = getattr(h, "inference_dtype", "") == "int8"
    C0 = h.upsample_initial_channel
    L = n_frames
    f = _conv1d(L, h.mel_dim, C0, 7, batch)
    c_in = C0
    n_stages = len(h.upsample_rates)
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        c_out = C0 // (2 ** (i + 1))
        L *= u
        fused = (c_out <= 128 and 128 % c_out == 0) or (
            int8_route and c_out % 128 == 0
        )
        g = max(1, 128 // c_out) if fused else 1
        if not fused:
            f += 2 * batch * L * c_in * c_out * (k / u)
        else:
            # fused ConvTranspose: n_o matmuls [*, W_in] @ [W_in, F*W_out]
            # per input row (L_in / g_in rows per utterance)
            g_in = max(1, 128 // c_in)
            W_in = g_in * c_in
            no, F = _transpose_offsets(k, u, g_in, g)
            f += 2 * batch * (L // u // g_in) * no * W_in * (F * g * c_out)
        for rk, rd in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
            for d in rd:
                dils = (d,) if h.resblock != "1" else (d, 1)
                for dc in dils:
                    if fused:
                        W = g * c_out
                        nq = len(_pack_offsets(rk, dc, g)[0])
                        f += 2 * batch * (L // g) * nq * W * W
                    else:
                        f += _conv1d(L, c_out, c_out, rk, batch)
        if i == n_stages - 1 and fused:
            # conv_post epilogue: nq matmuls [*, W]@[W, g*C_post]; the
            # MXU pads the narrow N to a full 128-lane tile
            W = g * c_out
            nq = len(_pack_offsets(7, 1, g)[0])
            f += 2 * batch * (L // g) * nq * W * max(g, 128)
        c_in = c_out
    if not (c_in <= 128 and 128 % c_in == 0):
        f += _conv1d(L, c_in, 1, 7, batch)
    return int(f)


def pipeline_flops(cfg, n_tokens, n_frames, batch=1):
    """Whole synthesis pipeline (duration -> acoustic decode -> vocoder)."""
    return (
        duration_flops(cfg, n_tokens, batch)
        + acoustic_decode_flops(cfg, n_tokens, n_frames, batch)
        + generator_flops(cfg, n_frames, batch)
    )


def mfu_report(
    flops: float, seconds: float, device=None, compute_dtype: str = "bf16"
) -> dict:
    """Achieved TFLOP/s and fraction-of-peak for one measured stage.

    The utilization key is named for the peak it divides by —
    ``mfu_bf16_peak`` for bf16/f32 compute, ``mfu_int8_peak`` (2x the
    bf16 MXU rate on v5e) when ``compute_dtype="int8"`` — so that
    **nothing labeled "mfu" can exceed 1.0** (advisor r3/r4: the int8
    runs were dividing int8-rate compute by the bf16 peak).  Ratios
    against *other* peaks are reported as ``nominal_flops_over_*`` —
    speedup-vs-hypothetical figures that may legitimately exceed 1.0.
    """
    bf16_peak, f32_peak = device_peaks(device)
    achieved = flops / max(seconds, 1e-12)
    out = {
        "flops": int(flops),
        "tflops_per_sec": achieved / 1e12,
        "nominal_flops_over_f32_peak": achieved / f32_peak,
    }
    if compute_dtype == "int8":
        out["mfu_int8_peak"] = achieved / (2 * bf16_peak)
        out["nominal_flops_over_bf16_peak"] = achieved / bf16_peak
    else:
        out["mfu_bf16_peak"] = achieved / bf16_peak
    return out
