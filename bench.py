"""End-to-end synthesis benchmark.

Measures the headline metric from BASELINE.md: single-chip end-to-end
real-time factor (RTF) — wall-clock seconds of compute per second of audio
produced — through the full pipeline (duration model -> acoustic AR decode
-> HiFi-GAN vocoder) at production model sizes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is target_rtf / measured_rtf against the BASELINE.json
target of RTF < 0.01 (values > 1 beat the target).

Trained checkpoints are not required: RTF is a pure-compute metric, so
randomly initialized weights at the exact production shapes measure the
same program XLA runs in serving.
"""

import json
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

TARGET_RTF = 0.01
N_FRAMES = 1024  # ~16.4 s of audio per utterance at 62.5 frames/s
N_TOKENS = 256
BATCH = 1
WARMUP = 2
ITERS = 5


def main():
    from viettts_tpu.config import Config
    from viettts_tpu.models import AcousticModel, DurationModel, Generator
    from viettts_tpu.types import DurationBatch

    cfg = Config()
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, 93, (BATCH, N_TOKENS)), jnp.int32)
    lengths = jnp.asarray([N_TOKENS] * BATCH, jnp.int32)

    # --- build models at production sizes, random init ---
    dm = DurationModel(cfg.duration)
    dvars = jax.jit(partial(dm.init, train=False))(
        {"params": jax.random.PRNGKey(0)},
        DurationBatch(toks, lengths, None),
    )
    dvars = {"params": dvars["params"], "batch_stats": dvars["batch_stats"]}
    predict_durations = jax.jit(partial(dm.apply, train=False))

    am = AcousticModel(cfg.acoustic)
    from viettts_tpu.types import AcousticBatch

    durations = jnp.full((BATCH, N_TOKENS), N_FRAMES / N_TOKENS, jnp.float32)
    ab = AcousticBatch(
        toks, lengths, durations, None, None,
        jnp.zeros((BATCH, N_FRAMES, cfg.acoustic.mel_dim)),
    )
    avars = jax.jit(partial(am.init, train=False))(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1)}, ab
    )
    avars = {"params": avars["params"], "batch_stats": avars["batch_stats"]}
    decode_mel = jax.jit(
        partial(
            am.apply,
            method=AcousticModel.inference,
            use_pallas=cfg.acoustic.fused_decode
            and jax.default_backend() != "cpu",
        ),
        static_argnums=(3,),
    )

    gen = Generator(cfg.hifigan)
    mel0 = jnp.zeros((BATCH, N_FRAMES, cfg.acoustic.mel_dim))
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), mel0)
    if cfg.hifigan.fused_inference and jax.default_backend() != "cpu":
        from viettts_tpu.models.hifigan import generator_apply_fused

        voc_quant = cfg.hifigan.inference_dtype == "int8"
        voc_dtype = (
            jnp.bfloat16
            if voc_quant or cfg.hifigan.inference_dtype in ("bfloat16", "bf16")
            else jnp.float32
        )
        hifi_params = gvars["params"]
        act_scales = None
        if voc_quant:
            # Mirror serving: Synthesizer.warmup() calibrates static int8
            # activation scales before compiling the serving programs.
            from viettts_tpu.models.hifigan import generator_calibrate_int8

            cal_mel = jnp.asarray(
                rng.randn(1, N_FRAMES, cfg.acoustic.mel_dim).astype(
                    np.float32
                )
                * 0.5
            )
            act_scales = jax.jit(
                lambda m: generator_calibrate_int8(cfg.hifigan, hifi_params, m)
            )(cal_mel)
        vocode = jax.jit(
            lambda _v, mel: generator_apply_fused(
                cfg.hifigan, hifi_params, mel, compute_dtype=voc_dtype,
                quantize_int8=voc_quant, act_scales=act_scales,
            )
        )
    else:
        vocode = jax.jit(gen.apply)

    prenet_key = jax.random.PRNGKey(42)

    def pipeline(seed_scalar):
        # seed_scalar creates a data dependency between iterations so the
        # whole chain must execute before the final fetch.
        d = predict_durations(dvars, DurationBatch(toks, lengths, None))
        d = d + seed_scalar * 0.0
        # fixed frame budget (bucketed serving shape)
        scale = N_FRAMES / jnp.sum(d, axis=1, keepdims=True)
        frames = d * scale
        mel = decode_mel(
            avars, toks, frames, N_FRAMES, lengths,
            rngs={"prenet": prenet_key},
        )
        wav = vocode(gvars, mel)
        return wav, wav[0, 0, 0]

    # Timing methodology: on the tunneled TPU backend, dispatch is async
    # and only a device->host fetch synchronizes (with a fixed RPC floor).
    # So we chain K dependent pipeline iterations, fetch one scalar, and
    # subtract the K=0 fetch floor.
    def run_chain(K):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(K):
            _, s = pipeline(s)
        _ = float(s)  # device->host sync
        return time.perf_counter() - t0

    for _ in range(WARMUP):
        run_chain(1)

    floor = min(run_chain(0) for _ in range(2))
    K = ITERS
    total = min(run_chain(K) for _ in range(2))
    elapsed = max(total - floor, 1e-9) / K
    audio_seconds = BATCH * N_FRAMES * cfg.dsp.hop_length / cfg.dsp.sample_rate
    rtf = elapsed / audio_seconds

    # Secondary metrics (BASELINE.json tracks vocoder samples/sec and
    # acoustic mel frames/sec as well) -> benchmarks/results.json.
    def sub_time(step):
        def chain(n):
            s = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                s = step(s)
            _ = float(s)
            return time.perf_counter() - t0

        chain(1)
        fl = chain(0)
        tt = min(chain(ITERS) for _ in range(2))
        return max(tt - fl, 1e-9) / ITERS

    mel_fixed = jnp.zeros((BATCH, N_FRAMES, cfg.acoustic.mel_dim))
    durs_fixed = jnp.full(
        (BATCH, N_TOKENS), N_FRAMES / N_TOKENS, jnp.float32
    )
    t_voc = sub_time(lambda s: vocode(gvars, mel_fixed + s * 0.0)[0, 0, 0])
    t_ac = sub_time(
        lambda s: decode_mel(
            avars, toks, durs_fixed + s * 0.0, N_FRAMES, lengths,
            rngs={"prenet": prenet_key},
        )[0, 0, 0]
    )
    # Roofline accounting: analytic FLOPs per stage -> achieved TFLOP/s
    # and fraction of chip peak (bf16 peak is the honest roofline — jax's
    # DEFAULT matmul precision runs f32 dots as single-pass bf16 on the
    # MXU; see viettts_tpu/utils/flops.py).
    from viettts_tpu.utils.flops import (
        acoustic_decode_flops,
        generator_flops,
        mfu_report,
        pipeline_flops,
    )

    details = {
        "end_to_end_rtf": rtf,
        "vocoder_samples_per_sec": BATCH * N_FRAMES * 256 / t_voc,
        "acoustic_mel_frames_per_sec": BATCH * N_FRAMES / t_ac,
        "batch": BATCH,
        "n_frames": N_FRAMES,
        "backend": jax.default_backend(),
        "mfu": {
            # pipeline keeps the bf16 denominator even on the int8 route
            # (only the vocoder MXU passes are int8 — conservative)
            "pipeline": mfu_report(
                pipeline_flops(cfg, N_TOKENS, N_FRAMES, BATCH), elapsed
            ),
            "vocoder": mfu_report(
                generator_flops(cfg, N_FRAMES, BATCH), t_voc,
                compute_dtype=(
                    "int8"
                    if cfg.hifigan.inference_dtype == "int8"
                    and jax.default_backend() != "cpu"
                    else "bf16"
                ),
            ),
            "acoustic": mfu_report(
                acoustic_decode_flops(cfg, N_TOKENS, N_FRAMES, BATCH), t_ac
            ),
        },
    }
    try:
        from pathlib import Path

        Path("benchmarks").mkdir(exist_ok=True)
        (Path("benchmarks") / "results.json").write_text(
            json.dumps(details, indent=2)
        )
    except OSError:
        pass

    print(
        json.dumps(
            {
                "metric": "end_to_end_rtf",
                "value": rtf,
                "unit": "seconds_compute_per_second_audio",
                "vs_baseline": TARGET_RTF / rtf,
            }
        )
    )


if __name__ == "__main__":
    main()
