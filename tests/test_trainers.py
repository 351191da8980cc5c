"""Trainer tests on a synthetic corpus over the virtual 8-device CPU mesh:
losses are finite and decrease, checkpoints save/resume, data-parallel
sharding actually splits the batch."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viettts_tpu.config import (
    AcousticModelConfig,
    Config,
    DataConfig,
    DspConfig,
    DurationModelConfig,
    TrainConfig,
)
from viettts_tpu.data.audio import write_wav

SR = 16000

TG_TEMPLATE = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.2
            text = ""
        intervals [2]:
            xmin = 0.2
            xmax = 0.7
            text = "ba"
        intervals [3]:
            xmin = 0.7
            xmax = 1.0
            text = ""
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.2
            text = "sil"
        intervals [2]:
            xmin = 0.2
            xmax = 0.45
            text = "b"
        intervals [3]:
            xmin = 0.45
            xmax = 0.7
            text = "a"
        intervals [4]:
            xmin = 0.7
            xmax = 1.0
            text = ""
"""


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    for i in range(18):
        (d / f"utt{i:02d}.TextGrid").write_text(TG_TEMPLATE)
        rng = np.random.RandomState(i)
        wav = (rng.randn(SR) * 2000).astype(np.int16)
        write_wav(d / f"utt{i:02d}.wav", wav, SR)
    return d


def _tiny_config(corpus, ckpt_dir, steps=4, spu=1):
    return Config(
        duration=DurationModelConfig(lstm_dim=16),
        acoustic=AcousticModelConfig(
            encoder_dim=16, decoder_dim=16, prenet_dim=8, postnet_dim=8
        ),
        dsp=DspConfig(),
        data=DataConfig(max_phoneme_seq_len=16, max_wave_len=SR),
        train=TrainConfig(
            batch_size=8,
            num_training_steps=steps,
            steps_per_update=spu,
            val_interval=2,
            ckpt_interval=2,
        ),
        ckpt_dir=ckpt_dir,
        data_dir=corpus,
    )


def test_duration_trainer_runs_and_resumes(corpus, tmp_path):
    from viettts_tpu.train import duration as dtrain

    cfg = _tiny_config(corpus, tmp_path, steps=4)
    state = dtrain.train(cfg)
    assert int(state.step) == 4
    ckpt = tmp_path / "duration_latest_ckpt.pickle"
    assert ckpt.exists()

    # resume continues from step 4
    cfg2 = _tiny_config(corpus, tmp_path, steps=6)
    state2 = dtrain.train(cfg2)
    assert int(state2.step) == 6


def test_duration_loss_decreases(corpus, tmp_path):
    from viettts_tpu.train import duration as dtrain
    from viettts_tpu.data.loader import DurationDataset
    from viettts_tpu.models import DurationModel
    from viettts_tpu.train.common import (
        init_train_state,
        make_optimizer,
        make_update_fn,
        stack_steps,
    )

    cfg = _tiny_config(corpus, tmp_path)
    model = DurationModel(cfg.duration)
    ds = DurationDataset(corpus, 16, "train")
    it = ds.batches(8, seed=0)
    rng = jax.random.PRNGKey(0)
    batch0 = next(it)
    variables = model.init({"params": rng, "dropout": rng}, batch0, train=True)
    opt = make_optimizer(1e-2)
    state = init_train_state(
        variables["params"], variables["batch_stats"], opt, rng
    )
    update = make_update_fn(
        dtrain.make_loss_fn(model, token_mask_prob=0.0, train=True), opt
    )
    losses = []
    for _ in range(12):
        batches = stack_steps([next(it)])
        state, loss = update(state, batches)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_acoustic_trainer_runs(corpus, tmp_path):
    from viettts_tpu.train import acoustic as atrain

    cfg = _tiny_config(corpus, tmp_path, steps=2)
    state = atrain.train(cfg, save_plots=False)
    assert int(state.step) == 2
    assert (tmp_path / "acoustic_latest_ckpt.pickle").exists()

    # the saved checkpoint loads through the auto-detecting loader
    from viettts_tpu.train.checkpoint import load_variables

    variables = load_variables(
        tmp_path / "acoustic_latest_ckpt.pickle", "acoustic"
    )
    assert "params" in variables and "batch_stats" in variables


def test_acoustic_steps_per_update_scan(corpus, tmp_path):
    """Multiple optimizer steps per dispatch (the reference TPU trainer's
    scan trick) advance the step counter correctly."""
    from viettts_tpu.train import acoustic as atrain

    cfg = _tiny_config(corpus, tmp_path, steps=4, spu=2)
    state = atrain.train(cfg, save_plots=False)
    assert int(state.step) == 4


def test_batch_actually_sharded(corpus):
    from viettts_tpu.data.loader import DurationDataset
    from viettts_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    ds = DurationDataset(corpus, 16, "train")
    batch = next(ds.batches(8))
    sharded = shard_batch(batch, mesh)
    # 8-element batch over 8 devices -> one row per device
    assert len(sharded.phonemes.sharding.device_set) == 8


def test_duration_trainer_mixed_precision(corpus, tmp_path):
    """Opt-in bf16 compute: loss stays finite and decreases; master params
    remain f32."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from viettts_tpu.data.loader import DurationDataset
    from viettts_tpu.models import DurationModel
    from viettts_tpu.train import duration as dtrain
    from viettts_tpu.train.common import (
        init_train_state,
        make_optimizer,
        make_update_fn,
        mixed_precision_loss,
        stack_steps,
    )

    cfg = _tiny_config(corpus, tmp_path)
    model = DurationModel(cfg.duration)
    ds = DurationDataset(corpus, 16, "train")
    it = ds.batches(8, seed=0)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, next(it), train=True)
    opt = make_optimizer(1e-2)
    state = init_train_state(
        variables["params"], variables["batch_stats"], opt, rng
    )
    update = make_update_fn(
        mixed_precision_loss(
            dtrain.make_loss_fn(model, token_mask_prob=0.0, train=True)
        ),
        opt,
    )
    losses = []
    for _ in range(10):
        state, loss = update(state, stack_steps([next(it)]))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # master params stayed f32
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state.params)
    )


def test_duration_trainer_orbax_checkpoint_resume(corpus, tmp_path):
    """checkpoint_format=orbax writes a tensorstore dir and resumes."""
    import dataclasses

    from viettts_tpu.train import duration as dtrain

    cfg = _tiny_config(corpus, tmp_path, steps=2)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, checkpoint_format="orbax")
    )
    state = dtrain.train(cfg)
    assert int(state.step) == 2
    assert (tmp_path / "duration_latest_ckpt.orbax").exists()
    assert not (tmp_path / "duration_latest_ckpt.pickle").exists()

    cfg2 = _tiny_config(corpus, tmp_path, steps=4)
    cfg2 = cfg2.replace(
        train=dataclasses.replace(cfg2.train, checkpoint_format="orbax")
    )
    state2 = dtrain.train(cfg2)
    assert int(state2.step) == 4
