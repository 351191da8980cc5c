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
