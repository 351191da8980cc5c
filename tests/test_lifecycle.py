"""Full-lifecycle integration test: train all three models a few steps on a
synthetic corpus, export GTA mels, finetune the vocoder on them, then
synthesize through the Synthesizer using the freshly trained checkpoints.

This is the test the reference never had (its de-facto integration test is
a shell script downloading pretrained checkpoints, quick_start.sh:10-12).
"""

from pathlib import Path

import numpy as np
import pytest

import jax

from viettts_tpu.config import (
    AcousticModelConfig,
    Config,
    DataConfig,
    DurationModelConfig,
    HifiGanConfig,
    TrainConfig,
)
from viettts_tpu.data.audio import write_wav

from tests.test_trainers import TG_TEMPLATE, SR


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    for i in range(18):
        (d / f"utt{i:02d}.TextGrid").write_text(TG_TEMPLATE)
        rng = np.random.RandomState(i)
        wav = (rng.randn(SR) * 2000).astype(np.int16)
        write_wav(d / f"utt{i:02d}.wav", wav, SR)
    return d


def test_full_lifecycle(corpus, tmp_path):
    cfg = Config(
        duration=DurationModelConfig(lstm_dim=16),
        acoustic=AcousticModelConfig(
            encoder_dim=16, decoder_dim=16, prenet_dim=8, postnet_dim=8
        ),
        hifigan=HifiGanConfig(
            upsample_initial_channel=16,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            segment_size=512,
            mpd_periods=(2,),
            mpd_base_channels=4,
            msd_scales=1,
            msd_base_channels=16,
        ),
        data=DataConfig(max_phoneme_seq_len=16, max_wave_len=SR),
        train=TrainConfig(
            batch_size=8, num_training_steps=2, val_interval=1, ckpt_interval=1
        ),
        ckpt_dir=tmp_path,
        data_dir=corpus,
    )

    # 1. duration + acoustic training
    from viettts_tpu.train import acoustic as atrain
    from viettts_tpu.train import duration as dtrain

    dtrain.train(cfg)
    atrain.train(cfg, save_plots=False)

    # 2. GTA export from the trained acoustic checkpoint
    from viettts_tpu.tools.gta import generate_gta

    gta_dir = tmp_path / "gta"
    n = generate_gta(gta_dir, cfg)
    assert n == 18

    # 3. vocoder GAN finetuning on GTA mels
    from viettts_tpu.train import hifigan as htrain

    state = htrain.train(cfg, wav_dir=corpus, gta_dir=gta_dir, num_steps=2)
    assert int(state.step) == 2

    # 4. end-to-end synthesis from the trained checkpoints
    from viettts_tpu.infer.pipeline import Synthesizer

    synth = Synthesizer(cfg)
    result = synth.synthesize("ba ba ba")
    assert result.wave.ndim == 1
    assert len(result.wave) > 0
    assert np.all(np.isfinite(result.wave))
    assert np.all(np.isfinite(result.mel))
