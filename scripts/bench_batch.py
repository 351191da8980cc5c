"""Batched long-form synthesis throughput (BASELINE.json config 5:
"64-utterance batch through full text->mel->waveform pipeline").

Reports audio-seconds generated per wall-clock second per chip for the
full pipeline and for the vocoder alone, using the chained-dispatch
methodology from bench.py.  Writes benchmarks/batch_results.json.
"""

import argparse
import json
import time
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 64
N_TOKENS = 256
N_FRAMES = 768  # ~12.3 s per utterance (the corpus max_wave_len)
K = 4


def amortized(step, iters=K, trials=3):
    def chain(n):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s)
        _ = float(s)
        return time.perf_counter() - t0

    chain(1)
    floor = min(chain(0) for _ in range(trials))
    total = min(chain(iters) for _ in range(trials))
    return max(total - floor, 1e-9) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--vocoder-dtype", default=None,
        choices=["float32", "bfloat16", "int8"],
        help="override hifigan.inference_dtype for the serving route",
    )
    parser.add_argument(
        "--int8-static", action="store_true",
        help="use calibrated static activation scales for the int8 route "
        "(generator_calibrate_int8 on a held-in mel; quality is still "
        "measured on a held-out mel)",
    )
    args = parser.parse_args()

    from viettts_tpu.config import Config
    from viettts_tpu.models import AcousticModel, DurationModel, Generator
    from viettts_tpu.models.hifigan import generator_apply_fused
    from viettts_tpu.types import AcousticBatch, DurationBatch

    cfg = Config()
    if args.vocoder_dtype is not None:
        from viettts_tpu.config import apply_overrides

        cfg = apply_overrides(
            cfg, [f"hifigan.inference_dtype={args.vocoder_dtype}"]
        )
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, 93, (BATCH, N_TOKENS)), jnp.int32)
    lengths = jnp.asarray([N_TOKENS] * BATCH, jnp.int32)
    durations = jnp.full((BATCH, N_TOKENS), N_FRAMES / N_TOKENS, jnp.float32)

    dm = DurationModel(cfg.duration)
    dvars = jax.jit(partial(dm.init, train=False))(
        {"params": jax.random.PRNGKey(0)}, DurationBatch(toks, lengths, None)
    )
    dvars = {"params": dvars["params"], "batch_stats": dvars["batch_stats"]}
    dapply = jax.jit(partial(dm.apply, train=False))

    am = AcousticModel(cfg.acoustic)
    ab = AcousticBatch(
        toks, lengths, durations, None, None,
        jnp.zeros((BATCH, N_FRAMES, 80)),
    )
    avars = jax.jit(partial(am.init, train=False))(
        {"params": jax.random.PRNGKey(0), "prenet": jax.random.PRNGKey(1)}, ab
    )
    avars = {"params": avars["params"], "batch_stats": avars["batch_stats"]}
    # Mirror the serving pipeline's decode routing (infer/pipeline.py
    # _decode_mel): the fused Pallas decoder's VMEM gate caps its batch,
    # and larger batches run as fused sub-batches — still ~2x faster than
    # one big scan decode (scripts/bench_ar.py).
    from viettts_tpu.ops.ar_decoder import pick_chunk

    acfg = cfg.acoustic
    fused_mb = 0
    b = 1
    while b <= BATCH and pick_chunk(
        b, acfg.decoder_dim, acfg.prenet_dim, acfg.mel_dim, N_FRAMES
    ) is not None:
        fused_mb = b
        b *= 2
    use_pallas = bool(fused_mb) and jax.default_backend() != "cpu"
    ainfer = jax.jit(
        partial(
            am.apply,
            method=AcousticModel.inference,
            use_pallas=use_pallas,
        ),
        static_argnums=(3,),
    )
    decode_mb = fused_mb if use_pallas and BATCH % fused_mb == 0 else BATCH

    gen = Generator(cfg.hifigan)
    mel0 = jnp.zeros((BATCH, N_FRAMES, 80))
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), mel0)
    hifi_params = gvars["params"]
    voc_quant = cfg.hifigan.inference_dtype == "int8"
    voc_dtype = (
        jnp.bfloat16
        if voc_quant or cfg.hifigan.inference_dtype in ("bfloat16", "bf16")
        else jnp.float32
    )
    act_scales = None
    if voc_quant and args.int8_static and jax.default_backend() != "cpu":
        from viettts_tpu.models.hifigan import generator_calibrate_int8

        cal_mel = jnp.asarray(
            rng.randn(4, N_FRAMES, 80).astype(np.float32) * 0.5
        )
        act_scales = jax.jit(
            lambda m: generator_calibrate_int8(cfg.hifigan, hifi_params, m)
        )(cal_mel)
    if jax.default_backend() != "cpu":
        vocode = jax.jit(
            lambda mel: generator_apply_fused(
                cfg.hifigan, hifi_params, mel, compute_dtype=voc_dtype,
                quantize_int8=voc_quant, act_scales=act_scales,
            )
        )
    else:
        vocode = jax.jit(lambda mel: gen.apply(gvars, mel))

    audio_secs = BATCH * N_FRAMES * cfg.dsp.hop_length / cfg.dsp.sample_rate

    def full(s):
        d = dapply(dvars, DurationBatch(toks, lengths, None)) + s * 0.0
        scale = N_FRAMES / jnp.sum(d, axis=1, keepdims=True)
        frames = d * scale
        mels = [
            ainfer(
                avars,
                toks[i : i + decode_mb],
                frames[i : i + decode_mb],
                N_FRAMES,
                lengths[i : i + decode_mb],
                rngs={"prenet": jax.random.PRNGKey(7)},
            )
            for i in range(0, BATCH, decode_mb)
        ]
        mel = mels[0] if len(mels) == 1 else jnp.concatenate(mels, axis=0)
        return vocode(mel)[0, 0, 0]

    def voc_only(s):
        return vocode(mel0 + s * 0.0)[0, 0, 0]

    t_full = amortized(full)
    t_voc = amortized(voc_only)

    # Quality bound for the low-precision route: waveform relative RMS
    # error vs the float32 fused route on a non-trivial mel (cf. the bf16
    # note in docs/BUILD_NOTES.md).
    quality = None
    if jax.default_backend() != "cpu" and (
        voc_quant or voc_dtype != jnp.float32
    ):
        melq = jnp.asarray(
            rng.randn(2, N_FRAMES, 80).astype(np.float32) * 0.5
        )
        wav_ref = np.asarray(
            jax.jit(
                lambda m: generator_apply_fused(cfg.hifigan, hifi_params, m)
            )(melq),
            np.float32,
        )
        wav_lp = np.asarray(vocode(melq), np.float32)
        rms = float(np.sqrt((wav_ref**2).mean()))
        quality = {
            "waveform_rel_rms_error_vs_f32": float(
                np.sqrt(((wav_lp - wav_ref) ** 2).mean()) / max(rms, 1e-12)
            ),
            "waveform_max_abs_error_vs_f32": float(
                np.abs(wav_lp - wav_ref).max()
            ),
        }

    from viettts_tpu.utils.flops import (
        generator_actual_flops,
        generator_flops,
        mfu_report,
        pipeline_flops,
    )

    results = {
        "batch": BATCH,
        "frames_per_utt": N_FRAMES,
        "audio_seconds_per_batch": audio_secs,
        "full_pipeline_ms": t_full * 1e3,
        "full_pipeline_rtf": t_full / audio_secs,
        "full_pipeline_audio_secs_per_sec": audio_secs / t_full,
        "vocoder_ms": t_voc * 1e3,
        "vocoder_samples_per_sec": BATCH * N_FRAMES * 256 / t_voc,
        "vocoder_dtype": cfg.hifigan.inference_dtype,
        "int8_scales": (
            ("static" if act_scales is not None else "dynamic")
            if voc_quant
            else None
        ),
        # route sanity check on the bench's random-init weights ONLY; the
        # authoritative serving-quality artifact is measured on TRAINED
        # weights by scripts/validate_int8.py
        "vocoder_quality": quality,
        "vocoder_quality_trained_weights": "benchmarks/int8_quality.json",
        "mfu": {
            # vocoder MXU passes are int8 on the quantized route; the
            # acoustic/duration stages stay bf16 so the pipeline figure
            # keeps the bf16 denominator (conservative: int8 stages make
            # it an under-, never over-statement of utilization)
            "pipeline": mfu_report(
                pipeline_flops(cfg, N_TOKENS, N_FRAMES, BATCH), t_full
            ),
            "vocoder": mfu_report(
                generator_flops(cfg, N_FRAMES, BATCH), t_voc,
                compute_dtype="int8" if voc_quant else "bf16",
            ),
            # against the MACs the fused path actually issues (incl. the
            # space-to-depth packing overhead of the narrow stages) —
            # distance from the kernel's structural MXU roofline
            "vocoder_actual_issued": mfu_report(
                generator_actual_flops(cfg, N_FRAMES, BATCH), t_voc,
                compute_dtype="int8" if voc_quant else "bf16",
            ),
        },
        "decode_sub_batch": decode_mb,
        "backend": jax.default_backend(),
    }
    out = Path("benchmarks")
    out.mkdir(exist_ok=True)
    (out / "batch_results.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
