"""Time-to-first-audio: streaming vs one-shot synthesis on hardware.

Builds random-init checkpoints at production sizes (RTF/latency are
pure-compute metrics), synthesizes a long multi-sentence text both ways,
and reports the first-chunk latency against the one-shot latency.
Writes benchmarks/stream_results.json.

Tunnel note: a blocking device fetch over the axon tunnel costs
~30-45 ms, so sub-100 ms latencies here carry that floor; on a
local-host TPU the numbers drop by roughly one fetch.  (Historical trap,
fixed: before the Synthesizer committed its weights with device_put,
every dispatch re-uploaded the full numpy weight trees — 0.8-1.8 s per
call — which buried the streaming win entirely.)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stream.py
"""

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

OUT = Path("benchmarks")


def make_ckpts(cfg, d: Path):
    from viettts_tpu.models import AcousticModel, DurationModel, Generator
    from viettts_tpu.train.checkpoint import NATIVE_FORMAT, save_checkpoint
    from viettts_tpu.types import AcousticBatch, DurationBatch

    toks = jnp.zeros((1, 8), jnp.int32)
    lengths = jnp.asarray([8], jnp.int32)
    dm = DurationModel(cfg.duration)
    dvars = jax.jit(lambda: dm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        DurationBatch(toks, lengths, None), train=True,
    ))()
    save_checkpoint(
        d / "duration_latest_ckpt.pickle",
        {"format": NATIVE_FORMAT, "step": 0, "variables": dict(dvars)},
    )
    am = AcousticModel(cfg.acoustic)
    ab = AcousticBatch(
        toks, lengths, jnp.ones((1, 8)), None, None,
        jnp.zeros((1, 16, cfg.acoustic.mel_dim)),
    )
    avars = jax.jit(lambda: am.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "prenet": jax.random.PRNGKey(2),
            "zoneout": jax.random.PRNGKey(3),
        },
        ab, train=True,
    ))()
    save_checkpoint(
        d / "acoustic_latest_ckpt.pickle",
        {
            "format": NATIVE_FORMAT,
            "step": 0,
            "variables": {
                "params": avars["params"],
                "batch_stats": avars["batch_stats"],
            },
        },
    )
    gen = Generator(cfg.hifigan)
    gvars = jax.jit(lambda: gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, cfg.acoustic.mel_dim))
    ))()
    save_checkpoint(
        d / "hifigan_latest_ckpt.pickle",
        {"format": NATIVE_FORMAT, "step": 0, "variables": dict(gvars)},
    )


def main():
    from viettts_tpu.config import Config
    from viettts_tpu.infer.pipeline import Synthesizer

    ckpt_dir = Path("/tmp/stream_bench_ckpts")
    ckpt_dir.mkdir(exist_ok=True)
    cfg = Config(ckpt_dir=ckpt_dir)
    if not (ckpt_dir / "hifigan_latest_ckpt.pickle").exists():
        make_ckpts(cfg, ckpt_dir)

    synth = Synthesizer(cfg)
    # The random-init duration model emits ~0.5 s/phoneme, which makes the
    # first chunk carry most of the audio and buries the streaming effect;
    # pin durations to a realistic 80 ms/phoneme so chunk sizes (and the
    # latency model) match real speech.  _durations_traced is the shared
    # hook: the bucketed path's jit and the single-dispatch lead program
    # both trace through it.
    synth._durations_traced = lambda _vars, batch: jnp.full(
        batch.phonemes.shape, 0.08, jnp.float32
    )
    # ~12 sentences -> well past the 256-token chunk cap
    sentence = "hôm qua em tới trường mẹ dắt tay từng bước. "
    text = sentence * 12

    # warm both paths (compile), both lead settings
    list(synth.stream(text))
    list(synth.stream(text, lead_tokens=0))
    synth.synthesize(text)

    def one_shot():
        t0 = time.perf_counter()
        r = synth.synthesize(text)
        return time.perf_counter() - t0, len(r.wave)

    def streamed(lead_tokens):
        t0 = time.perf_counter()
        first = None
        total = 0
        for res in synth.stream(text, lead_tokens=lead_tokens):
            if first is None:
                first = time.perf_counter() - t0
            total += len(res.wave)
        return first, time.perf_counter() - t0, total

    full_s, n_samples = min(one_shot() for _ in range(3))
    # lead chunk (default 64 tokens): chunk-0 decode+vocode is ~4x smaller
    first_s, stream_total_s, n_stream = min(
        streamed(64) for _ in range(3)
    )
    # full-size chunk 0 (the round-2 behavior) for comparison
    first_full, _, _ = min(streamed(0) for _ in range(3))
    sr = cfg.dsp.sample_rate
    result = {
        "text_tokens": len(synth.text_to_token_ids(text)),
        "audio_seconds": n_samples / sr,
        "one_shot_latency_s": round(full_s, 4),
        "stream_first_chunk_s": round(first_s, 4),
        "stream_first_chunk_full_lead_s": round(first_full, 4),
        "lead_chunk_ttfa_speedup": round(first_full / first_s, 2),
        "stream_total_s": round(stream_total_s, 4),
        "first_audio_speedup": round(full_s / first_s, 2),
        "samples_match": bool(n_stream == n_samples),
        "backend": jax.default_backend(),
    }
    OUT.mkdir(exist_ok=True)
    with open(OUT / "stream_results.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
