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


def test_vocoder_kill_and_resume(corpus, tmp_path):
    """Kill-and-resume fidelity for the GAN trainer: the resumed run picks
    up step/rng from the checkpoint and its crop stream continues rather
    than replaying the fresh run's first batches."""
    import jax.numpy as jnp

    from viettts_tpu.train import hifigan as htrain

    cfg = Config(
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
        train=TrainConfig(
            batch_size=4, num_training_steps=2, val_interval=1,
            ckpt_interval=1,
        ),
        ckpt_dir=tmp_path,
        data_dir=corpus,
    )

    seen = []
    state1 = htrain.train(
        cfg, wav_dir=corpus, num_steps=2,
        on_metrics=lambda step, m: seen.append(("fresh", step)),
    )
    assert int(state1.step) == 2

    # resumed run: restores step 2 and trains 2 more
    resumed_metrics = []
    state2 = htrain.train(
        cfg, wav_dir=corpus, num_steps=4,
        on_metrics=lambda step, m: resumed_metrics.append(step),
    )
    assert int(state2.step) == 4
    assert resumed_metrics == [3, 4]  # continued, not restarted

    # rng restored from the checkpoint, not re-seeded
    assert np.array_equal(np.asarray(state2.rng), np.asarray(state1.rng))

    # crop stream continues: the resumed run's first batch differs from
    # the fresh run's first batch (seed advanced by the restored step)
    ds = htrain.VocoderDataset(corpus, cfg.hifigan.segment_size, 256)
    fresh_first = next(ds.batches(4, seed=cfg.train.seed))[1]
    resumed_first = next(ds.batches(4, seed=cfg.train.seed + 2))[1]
    assert not np.array_equal(fresh_first, resumed_first)


def test_vocoder_orbax_checkpoint_roundtrip(corpus, tmp_path):
    """checkpoint_format='orbax': raw GAN state goes to a tensorstore dir,
    the pickle keeps the folded inference params, and resume restores the
    exact state."""
    import jax.numpy as jnp

    from viettts_tpu.train import hifigan as htrain
    from viettts_tpu.train.checkpoint import load_checkpoint

    cfg = Config(
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
        train=TrainConfig(
            batch_size=4, num_training_steps=1, val_interval=1,
            ckpt_interval=1, checkpoint_format="orbax",
        ),
        ckpt_dir=tmp_path,
        data_dir=corpus,
    )
    state = htrain.train(cfg, wav_dir=corpus, num_steps=1)
    ckpt_path = tmp_path / "hifigan_latest_ckpt.pickle"
    assert ckpt_path.exists()
    assert (tmp_path / "hifigan_latest_ckpt.orbax").is_dir()
    # pickle carries inference variables only (raw lives in orbax)
    dic = load_checkpoint(ckpt_path)
    assert "raw" not in dic and "variables" in dic

    restored = htrain.restore_vocoder_state(
        ckpt_path, jax.tree.map(jnp.zeros_like, state), "orbax"
    )
    assert restored is not None
    assert int(restored.step) == 1
    leaves1 = jax.tree.leaves(state.gen_params)
    leaves2 = jax.tree.leaves(restored.gen_params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
