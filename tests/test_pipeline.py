"""End-to-end pipeline tests with small randomly-initialized checkpoints."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viettts_tpu.config import (
    AcousticModelConfig,
    Config,
    DurationModelConfig,
    HifiGanConfig,
)
from viettts_tpu.models import AcousticModel, DurationModel, Generator
from viettts_tpu.train.checkpoint import NATIVE_FORMAT, save_checkpoint
from viettts_tpu.types import AcousticBatch, DurationBatch


@pytest.fixture(scope="module")
def tiny_cfg():
    return Config(
        duration=DurationModelConfig(lstm_dim=16),
        acoustic=AcousticModelConfig(
            encoder_dim=16, decoder_dim=16, prenet_dim=8, postnet_dim=8
        ),
        hifigan=HifiGanConfig(
            upsample_rates=(8, 8, 2, 2),
            upsample_kernel_sizes=(16, 16, 4, 4),
            upsample_initial_channel=16,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),),
        ),
    )


@pytest.fixture(scope="module")
def ckpt_dir(tiny_cfg, tmp_path_factory):
    """Write native-format checkpoints for all three models."""
    d = tmp_path_factory.mktemp("ckpts")
    toks = jnp.zeros((1, 8), jnp.int32)
    lengths = jnp.asarray([8], jnp.int32)

    dm = DurationModel(tiny_cfg.duration)
    dvars = dm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        DurationBatch(toks, lengths, None),
        train=True,
    )
    save_checkpoint(
        d / "duration_latest_ckpt.pickle",
        {"format": NATIVE_FORMAT, "step": 0, "variables": dict(dvars)},
    )

    am = AcousticModel(tiny_cfg.acoustic)
    ab = AcousticBatch(
        toks, lengths, jnp.ones((1, 8)), None, None, jnp.zeros((1, 16, 80))
    )
    avars = am.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "prenet": jax.random.PRNGKey(2),
            "zoneout": jax.random.PRNGKey(3),
        },
        ab,
        train=True,
    )
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

    gen = Generator(tiny_cfg.hifigan)
    gvars = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)))
    save_checkpoint(
        d / "hifigan_latest_ckpt.pickle",
        {"format": NATIVE_FORMAT, "step": 0, "variables": dict(gvars)},
    )
    return d


@pytest.fixture(scope="module")
def synth(tiny_cfg, ckpt_dir):
    from viettts_tpu.infer.pipeline import Synthesizer

    return Synthesizer(tiny_cfg.replace(ckpt_dir=ckpt_dir))


def test_synthesize_single(synth):
    result = synth.synthesize("xin chào thế giới")
    assert result.wave.ndim == 1
    assert len(result.wave) % 256 == 0
    assert len(result.wave) == result.mel.shape[0] * 256
    assert result.mel.shape[1] == 80
    assert np.all(np.isfinite(result.wave))
    assert np.abs(result.wave).max() <= 1.0


def test_synthesize_batch_matches_wave_lengths(synth):
    texts = ["một hai ba", "bốn năm sáu bảy tám chín mười"]
    results = synth.synthesize_batch(texts)
    assert len(results) == 2
    # longer text -> at least as many tokens -> durations differ per text
    assert results[0].durations.shape != results[1].durations.shape


def test_silence_clamping(synth):
    r_default = synth.synthesize("một . hai")
    r_clamped = synth.synthesize("một . hai", silence_duration=0.5)
    # clamped silences force at least 0.5 s for each sil token
    assert r_clamped.durations.max() >= 0.5
    assert np.all(r_clamped.durations >= r_default.durations - 1e-6)


def test_bucketing_no_recompile(synth):
    """Texts with slightly different lengths should land in the same
    bucket -> same compiled program (smoke: just ensure both run)."""
    a = synth.synthesize("một hai")
    b = synth.synthesize("một hai ba")
    assert a.wave is not None and b.wave is not None


def test_warmup(synth):
    synth.warmup(frame_buckets=(128,), batch_sizes=(1,))
    r = synth.synthesize("một hai")
    assert r.wave is not None


def test_quality_flag_and_int8_routing(tiny_cfg, ckpt_dir, monkeypatch):
    """hifigan.inference_dtype routes the vocoder (int8 -> quantized MRF on
    bf16 storage; float32 -> full fidelity), and the CLI --quality escape
    hatch forces the float32 route over any --set."""
    from viettts_tpu import synthesizer as cli
    from viettts_tpu.config import apply_overrides
    from viettts_tpu.infer import pipeline as pipeline_mod

    cfg = apply_overrides(
        tiny_cfg.replace(ckpt_dir=ckpt_dir), ["hifigan.inference_dtype=int8"]
    )
    s = pipeline_mod.Synthesizer(cfg)
    assert s._vocoder_quant is True
    assert s._vocoder_dtype == jnp.bfloat16

    s32 = pipeline_mod.Synthesizer(
        apply_overrides(cfg, ["hifigan.inference_dtype=float32"])
    )
    assert s32._vocoder_quant is False
    assert s32._vocoder_dtype == jnp.float32

    seen = {}

    class FakeSynth:
        def __init__(self, cfg, **kwargs):
            seen["cfg"] = cfg

        def synthesize(self, text, silence_duration=-1):
            from viettts_tpu.infer.pipeline import SynthesisResult

            return SynthesisResult(
                wave=np.zeros(16, np.float32),
                mel=np.zeros((2, 80), np.float32),
                durations=np.zeros(1, np.float32),
            )

    monkeypatch.setattr(pipeline_mod, "Synthesizer", FakeSynth)
    rc = cli.main(
        [
            "--text", "ba",
            "--output", "/dev/null",
            "--quality",
            "--set", "hifigan.inference_dtype=int8",
        ]
    )
    assert rc == 0
    assert seen["cfg"].hifigan.inference_dtype == "float32"


def test_cli_single(tiny_cfg, ckpt_dir, tmp_path, monkeypatch):
    from viettts_tpu import synthesizer as cli
    import viettts_tpu.config as config_mod

    out = tmp_path / "out.wav"
    # point the default config at the test checkpoints via --ckpt-dir
    rc = cli.main(
        [
            "--text", "xin chào",
            "--output", str(out),
            "--ckpt-dir", str(ckpt_dir),
            "--set", "duration.lstm_dim=16",
            "--set", "acoustic.encoder_dim=16",
            "--set", "acoustic.decoder_dim=16",
            "--set", "acoustic.prenet_dim=8",
            "--set", "acoustic.postnet_dim=8",
            "--set", "hifigan.upsample_initial_channel=16",
            # single resblock kernel; dilation list zip-truncates to match
            "--set", "hifigan.resblock_kernel_sizes=3",
        ]
    )
    assert rc == 0
    assert out.exists()
    from viettts_tpu.data.audio import read_wav

    sr, wav = read_wav(out)
    assert sr == 16000
    assert len(wav) > 0


def test_cli_save_mel(tiny_cfg, ckpt_dir, tmp_path):
    from viettts_tpu import synthesizer as cli

    out = tmp_path / "out.wav"
    mel_path = tmp_path / "mel"
    rc = cli.main(
        [
            "--text", "ba",
            "--output", str(out),
            "--save-mel", str(mel_path),
            "--ckpt-dir", str(ckpt_dir),
            "--set", "duration.lstm_dim=16",
            "--set", "acoustic.encoder_dim=16",
            "--set", "acoustic.decoder_dim=16",
            "--set", "acoustic.prenet_dim=8",
            "--set", "acoustic.postnet_dim=8",
            "--set", "hifigan.upsample_initial_channel=16",
            "--set", "hifigan.resblock_kernel_sizes=3",
        ]
    )
    assert rc == 0
    import numpy as np

    mel = np.load(mel_path.with_suffix(".npy"))
    assert mel.ndim == 2 and mel.shape[1] == 80


# ---------------------------------------------------------------------------
# Chunked long-form synthesis + infer API caching (round 2).
# ---------------------------------------------------------------------------


def test_chunk_token_rows_unit():
    from viettts_tpu.config import SIL_INDEX, WORD_END_INDEX
    from viettts_tpu.infer.pipeline import _chunk_token_rows

    toks = [SIL_INDEX]
    for w in range(20):
        toks += [10 + w % 5, 11, WORD_END_INDEX]
        if w % 4 == 3:
            toks.append(SIL_INDEX)
    toks.append(SIL_INDEX)
    rows = _chunk_token_rows(toks, 30)
    assert len(rows) > 1
    assert all(len(r) <= 30 for r in rows)
    assert all(r[0] == SIL_INDEX and r[-1] == SIL_INDEX for r in rows)
    # sil-boundary splits share the sil -> lossless reconstruction
    rebuilt = list(rows[0])
    for r in rows[1:]:
        assert rebuilt[-1] == r[0] == SIL_INDEX
        rebuilt += r[1:]
    assert rebuilt == toks
    # short inputs pass through untouched
    assert _chunk_token_rows(toks, 1000) == [toks]
    # no interior sil: falls back to word-end cuts with inserted sils
    toks2 = [SIL_INDEX] + [5, 6, WORD_END_INDEX] * 20 + [SIL_INDEX]
    rows2 = _chunk_token_rows(toks2, 16)
    assert len(rows2) > 1
    assert all(len(r) <= 16 for r in rows2)
    assert all(r[0] == SIL_INDEX and r[-1] == SIL_INDEX for r in rows2)
    # lead chunk: chunk 0 capped tighter (streaming TTFA), rest at the cap,
    # same lossless sil-sharing reconstruction
    rows3 = _chunk_token_rows(toks, 30, first_chunk_tokens=16)
    assert len(rows3[0]) <= 16
    assert all(len(r) <= 30 for r in rows3[1:])
    rebuilt3 = list(rows3[0])
    for r in rows3[1:]:
        assert rebuilt3[-1] == r[0] == SIL_INDEX
        rebuilt3 += r[1:]
    assert rebuilt3 == toks
    # lead larger than the cap is clamped to the cap
    assert _chunk_token_rows(toks, 30, first_chunk_tokens=100) == rows


def test_long_form_chunked_synthesis(tiny_cfg, ckpt_dir):
    """A paragraph beyond the training token cap synthesizes via chunking
    with a consistent wave/mel/durations result."""
    from viettts_tpu.config import DataConfig
    from viettts_tpu.infer.pipeline import Synthesizer

    cfg = tiny_cfg.replace(
        ckpt_dir=ckpt_dir, data=DataConfig(max_phoneme_seq_len=24)
    )
    synth = Synthesizer(cfg)
    text = " . ".join(["một hai ba bốn"] * 6)
    toks = synth.text_to_token_ids(text)
    assert len(toks) > 24  # genuinely long-form for this cap
    r = synth.synthesize(text)
    assert len(r.wave) == r.mel.shape[0] * 256
    assert r.mel.shape[0] > 0 and np.all(np.isfinite(r.wave))
    # durations cover at least every real (non-shared) token once
    assert r.durations.shape[0] >= len(toks)


def test_get_synthesizer_cached(tiny_cfg, ckpt_dir):
    from viettts_tpu import infer

    infer.clear_synthesizer_cache()
    cfg = tiny_cfg.replace(ckpt_dir=ckpt_dir)
    s1 = infer.get_synthesizer(cfg=cfg)
    assert infer.get_synthesizer(cfg=cfg) is s1  # no rebuild / re-jit
    s2 = infer.get_synthesizer(cfg=cfg, prenet_seed=7)
    assert s2 is not s1
    assert infer.get_synthesizer(cfg=cfg, prenet_seed=7) is s2
    infer.clear_synthesizer_cache()


def test_public_vocode(synth):
    mel = np.zeros((2, 16, 80), np.float32)
    wav = synth.vocode(mel)
    assert wav.shape == (2, 16 * 256)
    assert np.all(np.isfinite(wav))


def test_decode_mel_sub_batch_split(synth):
    """Batches beyond the fused-decode VMEM gate run as fused sub-batches
    (scripts/bench_ar.py: ~2x over one big scan)."""
    old = synth._fused_decode_max_batch
    try:
        synth._fused_decode_max_batch = 1
        res = synth.synthesize_batch(["một hai", "ba bốn nam"])
    finally:
        synth._fused_decode_max_batch = old
    assert len(res) == 2
    for r in res:
        assert len(r.wave) == r.mel.shape[0] * 256
        assert np.all(np.isfinite(r.wave))


def test_batch_size_bucketing(synth):
    """Batch dim pads to a power-of-two bucket; padded rows are dropped."""
    texts = ["một", "hai ba", "bốn năm sáu"]
    results = synth.synthesize_batch(texts)
    assert len(results) == 3
    for r in results:
        assert np.all(np.isfinite(r.wave))
    # a single text still works (bucket 1) and matches unbatched output
    r1 = synth.synthesize_batch(["một hai"])[0]
    r2 = synth.synthesize("một hai")
    assert len(r1.wave) == len(r2.wave)


def test_mesh_sharded_serving_matches_unsharded(tiny_cfg, ckpt_dir):
    """shard_map serving over an 8-device mesh produces the same audio as
    the single-device path (prenet dropout disabled so the decode is
    deterministic and shard-count-invariant).  Pure-XLA routing: the
    multi-shape interpret-Pallas version of this test took ~17 min of CPU
    compile alone; kernel-vs-XLA equivalence is covered by test_mrf /
    test_ar_decoder and kernels-under-shard_map (one shape) by
    test_mesh_sharded_serving_pallas_single_shape below."""
    import dataclasses

    from viettts_tpu.infer.pipeline import Synthesizer
    from viettts_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg.replace(
        ckpt_dir=ckpt_dir,
        acoustic=dataclasses.replace(
            tiny_cfg.acoustic,
            prenet_dropout_at_inference=False,
            fused_decode=False,
        ),
        hifigan=dataclasses.replace(tiny_cfg.hifigan, fused_inference=False),
    )
    texts = ["một hai ba", "bốn năm", "sáu bảy tám chín", "mười", "xin chào"]
    plain = Synthesizer(cfg)
    sharded = Synthesizer(cfg, mesh=make_mesh(8))
    res_p = plain.synthesize_batch(texts)
    res_s = sharded.synthesize_batch(texts)
    assert len(res_s) == len(res_p) == len(texts)
    for p, s in zip(res_p, res_s):
        assert s.wave.shape == p.wave.shape
        np.testing.assert_allclose(s.mel, p.mel, atol=1e-4)
        np.testing.assert_allclose(s.wave, p.wave, atol=1e-4)
    # single-utterance path (single-dispatch lead or mesh-padded batch)
    one = sharded.synthesize("một hai ba")
    np.testing.assert_allclose(one.wave, res_p[0].wave, atol=1e-4)


def test_mesh_sharded_serving_pallas_single_shape(tiny_cfg, ckpt_dir):
    """The Pallas kernels (fused decode + MRF vocoder) compile and run
    inside the shard_map serving program — one (batch, tokens, frames)
    shape only, since every shape recompiles the interpret-mode kernels
    on CPU (the real-TPU serving path runs kernels under the mesh)."""
    import dataclasses

    from viettts_tpu.infer.pipeline import Synthesizer
    from viettts_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg.replace(
        ckpt_dir=ckpt_dir,
        acoustic=dataclasses.replace(
            tiny_cfg.acoustic, prenet_dropout_at_inference=False
        ),
    )
    texts = ["một hai ba"] * 8  # one row per device: a single batch shape
    sharded = Synthesizer(cfg, mesh=make_mesh(8))
    res = sharded.synthesize_batch(texts)
    assert len(res) == 8
    for r in res:
        assert len(r.wave) == r.mel.shape[0] * 256
        assert np.all(np.isfinite(r.wave))
    # identical rows -> identical audio across shards
    for r in res[1:]:
        np.testing.assert_array_equal(r.wave, res[0].wave)


def test_streaming_matches_synthesize(tiny_cfg, ckpt_dir):
    """stream() yields per-chunk audio whose concatenation reproduces the
    one-shot synthesize() output (prenet dropout disabled so both paths
    are deterministic)."""
    import dataclasses

    from viettts_tpu.config import DataConfig
    from viettts_tpu.infer.pipeline import Synthesizer

    cfg = tiny_cfg.replace(
        ckpt_dir=ckpt_dir,
        data=DataConfig(max_phoneme_seq_len=16),
        acoustic=dataclasses.replace(
            tiny_cfg.acoustic, prenet_dropout_at_inference=False
        ),
    )
    synth = Synthesizer(cfg)
    text = "một hai ba bốn năm sáu bảy tám chín mười"
    chunks = list(synth.stream(text))
    assert len(chunks) >= 2
    whole = synth.synthesize(text)
    got = np.concatenate([c.wave for c in chunks])
    assert got.shape == whole.wave.shape
    np.testing.assert_allclose(got, whole.wave, atol=1e-4)


def test_cli_stream_matches_one_shot(tiny_cfg, ckpt_dir, tmp_path):
    """--stream writes the wav progressively; with deterministic decode
    it matches the one-shot CLI output to int16 rounding."""
    import wave as wave_mod

    from viettts_tpu import synthesizer as cli

    common = [
        "--text", "một hai ba bốn năm sáu bảy tám chín mười",
        "--ckpt-dir", str(ckpt_dir),
        "--set", "duration.lstm_dim=16",
        "--set", "acoustic.encoder_dim=16",
        "--set", "acoustic.decoder_dim=16",
        "--set", "acoustic.prenet_dim=8",
        "--set", "acoustic.postnet_dim=8",
        "--set", "acoustic.prenet_dropout_at_inference=false",
        "--set", "hifigan.upsample_initial_channel=16",
        "--set", "hifigan.resblock_kernel_sizes=3",
        "--set", "data.max_phoneme_seq_len=16",  # force >=2 chunks
    ]
    one = tmp_path / "one.wav"
    streamed = tmp_path / "streamed.wav"
    assert cli.main(common + ["--output", str(one)]) == 0
    assert cli.main(common + ["--output", str(streamed), "--stream"]) == 0
    with wave_mod.open(str(one)) as w1, wave_mod.open(str(streamed)) as w2:
        assert w1.getnframes() == w2.getnframes()
        a = np.frombuffer(w1.readframes(w1.getnframes()), "<i2")
        b = np.frombuffer(w2.readframes(w2.getnframes()), "<i2")
        # identical float audio up to int16 rounding (batch-size routing
        # differences shift values by ~1e-7, i.e. at most 1 LSB)
        assert np.max(np.abs(a.astype(np.int32) - b.astype(np.int32))) <= 1


def _jit_sig(*arrays):
    """The parts of an argument list that determine a jit cache hit."""
    return tuple(
        (a.shape, str(a.dtype), bool(getattr(a, "weak_type", False)))
        for a in arrays
    )


def test_single_dispatch_matches_bucketed(tiny_cfg, ckpt_dir):
    """The single-dispatch program (duration -> decode -> vocode in one
    jit, used for stream()'s lead chunk) produces the same audio as the
    bucketed two-round-trip path, and falls back (returns None) when the
    predicted frame total overflows its static budget."""
    import dataclasses

    from viettts_tpu.infer.pipeline import Synthesizer

    # Pallas paths off: interpret-mode kernels inside the combined jit
    # make the CPU compile take minutes (the lead path skips itself on
    # CPU for the same reason — exercised here with pure-XLA routing;
    # kernel-vs-XLA equivalence is covered by test_mrf/test_ar_decoder).
    cfg = tiny_cfg.replace(
        ckpt_dir=ckpt_dir,
        acoustic=dataclasses.replace(
            tiny_cfg.acoustic,
            prenet_dropout_at_inference=False,
            fused_decode=False,
        ),
        hifigan=dataclasses.replace(
            tiny_cfg.hifigan, fused_inference=False
        ),
    )
    synth = Synthesizer(cfg)
    # pin durations to realistic speech (~80 ms/phoneme) so the fused
    # frame budget (LEAD_FRAMES_PER_TOKEN) holds; _durations_traced is
    # shared by both paths, so they stay comparable
    synth._durations_traced = lambda _v, b: jnp.full(
        b.phonemes.shape, 0.08, jnp.float32
    )
    row = synth.text_to_token_ids("một hai ba bốn năm")
    fused = synth._synthesize_single_fused(row, -1.0)
    assert fused is not None
    bucketed = synth._synthesize_rows([row])[0]
    assert fused.wave.shape == bucketed.wave.shape
    np.testing.assert_allclose(fused.durations, bucketed.durations, atol=1e-6)
    # identical prefix decode: the fused program decodes a larger static
    # frame budget, but the AR decode is causal, so the kept audio matches
    np.testing.assert_allclose(fused.wave, bucketed.wave, atol=1e-4)
    np.testing.assert_allclose(fused.mel, bucketed.mel, atol=1e-4)

    # synthesize() and singleton synthesize_batch() route short texts
    # through the same single-dispatch program (bitwise identical)
    one = synth.synthesize("một hai ba bốn năm")
    np.testing.assert_array_equal(one.wave, fused.wave)
    b = synth.synthesize_batch(["một hai ba bốn năm"])[0]
    np.testing.assert_array_equal(b.wave, fused.wave)

    # overflow: absurd pacing (0.5 s/phoneme on a near-bucket-length row)
    # must fall back rather than truncate
    synth2 = Synthesizer(cfg)
    synth2._durations_traced = lambda _v, b: jnp.full(
        b.phonemes.shape, 0.5, jnp.float32
    )
    long_row = synth2.text_to_token_ids(
        "một hai ba bốn năm sáu bảy tám chín mười"
    )
    assert synth2._synthesize_single_fused(long_row, -1.0) is None


def test_warmup_pads_batch_to_mesh(tiny_cfg, ckpt_dir):
    """warmup() with a mesh rounds batch sizes up to the data axis and
    calls the sharded program with *exactly* the jit signature real
    dispatch uses (shape + dtype + weak_type — a weak_type durs array
    used to make warmup compile a program serving never reuses).
    `--num-devices 8 --warmup` used to crash on a batch of 1 that
    shard_map can't split.

    The sharded fn is stubbed: end-to-end mesh serving compiles are
    covered by test_mesh_sharded_serving_matches_unsharded; this test
    asserts warmup's dispatch contract without minutes of CPU XLA."""
    from viettts_tpu.infer.pipeline import Synthesizer
    from viettts_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg.replace(ckpt_dir=ckpt_dir)
    synth = Synthesizer(cfg, mesh=make_mesh(8), token_buckets=(8, 16))
    calls = []

    def fake_sharded_fn(nf):
        def f(avars, hvars, toks, durs, lengths, key):
            calls.append((nf,) + _jit_sig(toks, durs, lengths))
            B = toks.shape[0]
            mel = jnp.zeros((B, nf, cfg.acoustic.mel_dim))
            return mel, jnp.zeros((B, nf * 256, 1))

        return f

    synth._sharded_fn = fake_sharded_fn
    # pin durations to realistic speech (~80 ms/phoneme) — the random-init
    # duration model would dispatch an absurd frame bucket
    synth._predict_durations = lambda _v, batch: jnp.full(
        batch.phonemes.shape, 0.08, jnp.float32
    )
    # must not raise; batch 1 -> 8, 8 stays 8 (deduped)
    synth.warmup(batch_sizes=(1, 8))
    warmed = set(calls)
    assert all(sig[1][0][0] == 8 for sig in warmed)  # batch padded to mesh
    # a single-text request must hit a warmed signature exactly
    calls.clear()
    res = synth.synthesize("một hai ba")
    assert len(res.wave) > 0
    assert len(calls) == 1
    assert calls[0] in warmed


def test_warmup_covers_silence_clamped_pacing(tiny_cfg, ckpt_dir):
    """A silence_duration-clamped request after warmup(silence_durations=
    (0.5,)) dispatches only warmed program shapes: the clamp paces sil
    tokens at ~31 frames/token (beyond the default 4-8 coverage), and the
    snap-to-compiled-bucket logic routes it into a warmed bucket instead
    of compiling mid-serving (round-3 weak item #5)."""
    from viettts_tpu.infer.pipeline import Synthesizer

    cfg = tiny_cfg.replace(ckpt_dir=ckpt_dir)
    synth = Synthesizer(cfg, token_buckets=(8, 16))
    seen = []

    def fake_decode(variables, toks, frames, n_frames, lengths, rngs):
        seen.append((toks.shape[0], toks.shape[1], n_frames))
        return jnp.zeros((toks.shape[0], n_frames, cfg.acoustic.mel_dim))

    synth._decode_mel = fake_decode
    synth._vocode = lambda _v, mel: jnp.zeros(
        (mel.shape[0], mel.shape[1] * 256, 1)
    )
    synth._predict_durations = lambda _v, batch: jnp.full(
        batch.phonemes.shape, 0.08, jnp.float32
    )
    synth.warmup(silence_durations=(0.5,))
    warmed = set(seen)
    seen.clear()
    # "a . b . c ." -> 4 sil tokens in a <=16-token row; clamped at 0.5 s
    # each, total ~156 frames -> natural bucket 256 (> tb*8 = 128)
    res = synth._synthesize_rows([synth.text_to_token_ids("y . e . o .")],
                                 silence_duration=0.5)
    assert len(res) == 1
    assert seen and all(s in warmed for s in seen)

    # control: without silence_durations coverage the same request is a
    # compile miss (nothing warmed fits 156 frames for the 16-token bucket)
    synth2 = Synthesizer(cfg, token_buckets=(8, 16))
    synth2._decode_mel = fake_decode
    synth2._vocode = synth._vocode
    synth2._predict_durations = synth._predict_durations
    seen.clear()
    synth2.warmup()
    warmed2 = set(seen)
    seen.clear()
    synth2._synthesize_rows(
        [synth2.text_to_token_ids("y . e . o .")], silence_duration=0.5
    )
    assert any(s not in warmed2 for s in seen)


def test_dispatch_snaps_to_compiled_bucket(tiny_cfg, ckpt_dir):
    """When the natural frame bucket isn't compiled but a larger one
    (within 2x) is, dispatch reuses the compiled program; buckets beyond
    2x are not snapped to (bounded decode waste)."""
    from viettts_tpu.infer.pipeline import Synthesizer

    cfg = tiny_cfg.replace(ckpt_dir=ckpt_dir)
    synth = Synthesizer(cfg, token_buckets=(8, 16))
    seen = []

    def fake_decode(variables, toks, frames, n_frames, lengths, rngs):
        seen.append(n_frames)
        return jnp.zeros((toks.shape[0], n_frames, cfg.acoustic.mel_dim))

    synth._decode_mel = fake_decode
    synth._vocode = lambda _v, mel: jnp.zeros(
        (mel.shape[0], mel.shape[1] * 256, 1)
    )
    row = [1, 2, 3]
    toks = np.zeros((1, 8), np.int32)
    toks[0, :3] = row
    lengths = np.asarray([3], np.int32)
    # needed ~ 150 frames (dur 0.8 s x 3 tokens) -> natural bucket 256
    durs = np.full((1, 8), 0.0, np.float32)
    durs[0, :3] = 0.8
    synth._compiled_nf[(1, 8)] = {512}  # 512 <= 2*256: snap
    synth._finalize_rows(synth._dispatch_decode([row], toks, lengths, durs))
    assert seen == [512]
    seen.clear()
    synth._compiled_nf[(1, 8)] = {640}  # 640 > 2*256: no snap
    synth._finalize_rows(synth._dispatch_decode([row], toks, lengths, durs))
    assert seen == [256]


def test_mesh_stream_lead_and_pipelining(tiny_cfg, ckpt_dir):
    """Mesh-mode stream() keeps both streaming wins: the single-dispatch
    lead chunk (replicated over the mesh) and async one-chunk-ahead
    dispatch; the concatenated audio matches the unsharded stream."""
    import dataclasses

    from viettts_tpu.config import DataConfig
    from viettts_tpu.infer.pipeline import Synthesizer
    from viettts_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg.replace(
        ckpt_dir=ckpt_dir,
        data=DataConfig(max_phoneme_seq_len=16),
        acoustic=dataclasses.replace(
            tiny_cfg.acoustic,
            prenet_dropout_at_inference=False,
            fused_decode=False,  # pure-XLA so the lead compiles on CPU
        ),
        hifigan=dataclasses.replace(tiny_cfg.hifigan, fused_inference=False),
    )
    text = "một hai ba bốn năm sáu bảy tám chín mười"
    plain = Synthesizer(cfg)
    sharded = Synthesizer(cfg, mesh=make_mesh(8))
    lead_calls = []
    orig = sharded._synthesize_single_fused
    sharded._synthesize_single_fused = lambda *a: (
        lead_calls.append(a), orig(*a)
    )[1]
    chunks_p = list(plain.stream(text, lead_tokens=8))
    chunks_s = list(sharded.stream(text, lead_tokens=8))
    # the lead chunk ran through the single-dispatch program under the mesh
    assert lead_calls and chunks_s[0].wave.shape == chunks_p[0].wave.shape
    assert len(chunks_s) == len(chunks_p) >= 2
    got_p = np.concatenate([c.wave for c in chunks_p])
    got_s = np.concatenate([c.wave for c in chunks_s])
    np.testing.assert_allclose(got_s, got_p, atol=1e-4)


def test_warmup_covers_all_token_buckets(tiny_cfg, ckpt_dir):
    """warmup() precompiles every configured token bucket by default, so
    real traffic beyond the smallest bucket doesn't pay first-request
    compiles (round-2 warmup only touched token_buckets[0]).  Decode and
    vocode are stubbed — the real programs are exercised elsewhere; this
    asserts warmup's coverage and signature, cheaply."""
    from viettts_tpu.infer.pipeline import Synthesizer

    cfg = tiny_cfg.replace(ckpt_dir=ckpt_dir)
    synth = Synthesizer(cfg, token_buckets=(8, 16))
    seen = []

    def fake_decode(variables, toks, frames, n_frames, lengths, rngs):
        seen.append(_jit_sig(toks, frames, lengths))
        return jnp.zeros((toks.shape[0], n_frames, cfg.acoustic.mel_dim))

    synth._decode_mel = fake_decode
    synth._vocode = lambda _v, mel: jnp.zeros(
        (mel.shape[0], mel.shape[1] * 256, 1)
    )
    synth.warmup()
    assert {sig[0][0][1] for sig in seen} == {8, 16}
    # warmed signatures must be strong-typed (what real dispatch passes)
    assert all(not weak for sig in seen for _, _, weak in sig)


def test_calibrate_int8_surface(tiny_cfg, ckpt_dir):
    """calibrate_int8 is a no-op on the CPU backend (returns False) and
    manually-installed static scales rebind a working vocoder program."""
    from viettts_tpu.config import apply_overrides
    from viettts_tpu.infer.pipeline import Synthesizer
    from viettts_tpu.models.hifigan import generator_calibrate_int8

    cfg = apply_overrides(
        tiny_cfg.replace(ckpt_dir=ckpt_dir), ["hifigan.inference_dtype=int8"]
    )
    s = Synthesizer(cfg)
    assert s.calibrate_int8() is False  # CPU backend: dynamic route stays
    assert s._act_scales is None

    # Install scales by hand (what calibrate_int8 does on device backends)
    # and check the rebound vocoder still reproduces the dynamic route.
    mel = jnp.asarray(
        np.random.RandomState(3).randn(1, 16, 80).astype(np.float32)
    )
    ref = s.vocode(mel)
    s._act_scales = generator_calibrate_int8(
        cfg.hifigan, s._hifigan_vars["params"], mel
    )
    s._build_vocode()
    got = s.vocode(mel)
    assert got.shape == ref.shape
    rms = float(np.sqrt((ref ** 2).mean()))
    err = float(np.sqrt(((got - ref) ** 2).mean()))
    assert err / max(rms, 1e-6) < 0.05, (err, rms)


def test_calibrate_int8_decode_path_on_cpu(tiny_cfg, ckpt_dir, monkeypatch):
    """The default text->durations->decode calibration path runs under a
    faked non-CPU backend gate (advisor r4: it was unreachable in CI, so
    a bucketing/signature regression would only surface at TPU serving
    init).  Also asserts multi-utterance tree-max + the 1.25x margin."""
    from viettts_tpu.config import apply_overrides
    from viettts_tpu.infer import pipeline as pl
    from viettts_tpu.models.hifigan import generator_calibrate_int8

    cfg = apply_overrides(
        tiny_cfg.replace(ckpt_dir=ckpt_dir),
        # scan decode: the fused AR kernel reads the faked backend too and
        # would dispatch a real (non-interpret) pallas_call on CPU
        ["hifigan.inference_dtype=int8", "acoustic.fused_decode=false"],
    )
    s = pl.Synthesizer(cfg, token_buckets=(32, 64))
    # fake the backend gate only (decode/calibration math still runs on
    # CPU); _build_vocode's interpret flag also reads it, but the rebound
    # vocoder is never dispatched here
    monkeypatch.setattr(pl.jax, "default_backend", lambda: "tpu")
    texts = ("xin chào", "hôm nay trời nắng đẹp quá")
    assert s.calibrate_int8(texts=texts) is True
    assert s._act_scales is not None

    # the installed scales are the per-text tree-max, widened by 1.25x
    mels = [s._calibration_mel(t) for t in texts]
    per_text = [
        generator_calibrate_int8(cfg.hifigan, s._hifigan_vars["params"], m)
        for m in mels
    ]
    expect = jax.tree.map(jnp.maximum, *per_text)
    for k, v in s._act_scales.items():
        np.testing.assert_allclose(
            np.asarray(v), 1.25 * np.asarray(expect[k]), rtol=1e-6
        )


def test_int8_clip_stats(tiny_cfg, ckpt_dir):
    """Clip-rate probe: ~zero on the calibration input (margin headroom),
    large on a 10x out-of-range input; surfaced via last_clip_stats."""
    from viettts_tpu.config import apply_overrides
    from viettts_tpu.infer.pipeline import Synthesizer
    from viettts_tpu.models.hifigan import generator_calibrate_int8

    cfg = apply_overrides(
        tiny_cfg.replace(ckpt_dir=ckpt_dir), ["hifigan.inference_dtype=int8"]
    )
    s = Synthesizer(cfg)
    mel = jnp.asarray(
        np.random.RandomState(7).randn(1, 16, 80).astype(np.float32)
    )
    with pytest.raises(RuntimeError):
        s.int8_clip_stats(mel=mel)  # not calibrated yet

    params = s._hifigan_vars["params"]
    s._act_scales = jax.tree.map(
        lambda x: x * 1.25,
        generator_calibrate_int8(cfg.hifigan, params, mel),
    )
    in_range = s.int8_clip_stats(mel=mel)
    assert in_range["max_clip_fraction"] == 0.0
    out_range = s.int8_clip_stats(mel=10.0 * mel)
    assert out_range["max_clip_fraction"] > 0.01
    assert s.last_clip_stats is out_range
    # 2-D mels are accepted (the serve-side probe passes result.mel)
    assert s.int8_clip_stats(mel=np.asarray(mel[0]))["max_clip_fraction"] == 0.0
