"""Golden-value regression tests: pinned numeric outputs of the DSP and a
fixed-seed model forward.  These detect silent numeric drift across
refactors/rounds (tolerances are loose enough to survive compiler-version
noise, tight enough to catch semantic changes)."""

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config, DurationModelConfig
from viettts_tpu.models import DurationModel
from viettts_tpu.ops.mel import LogMelSpectrogram, mel_filterbank
from viettts_tpu.types import DurationBatch


def test_log_mel_golden():
    cfg = Config()
    t = np.arange(8192) / 16000.0
    y = (
        0.3 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1330 * t)
    ).astype(np.float32)[None]
    mel = np.asarray(LogMelSpectrogram(cfg.dsp)(jnp.asarray(y)))
    assert mel.shape == (1, 32, 80)
    golden = [-9.58831, -7.81750, -3.19090, -11.51292, -11.51292]
    np.testing.assert_allclose(mel[0, 5, ::16], golden, atol=2e-3)


def test_mel_filterbank_golden():
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    # filter 40: triangular support over bins 107..114 (Slaney norm)
    golden = [0.0035171, 0.0071594, 0.0108018, 0.0144442, 0.0122666, 0.0087615]
    np.testing.assert_allclose(fb[40, 107:113], golden, atol=1e-6)
    assert fb[40, :107].max() == 0.0
    assert fb[40, 115:].max() == 0.0


def test_duration_model_golden():
    dm = DurationModel(DurationModelConfig(lstm_dim=16))
    toks = jnp.asarray(np.arange(8, dtype=np.int32)[None] % 93)
    batch = DurationBatch(toks, jnp.asarray([8]), None)
    v = dm.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = np.asarray(dm.apply(v, batch, train=False))
    golden = [
        0.683484, 0.688088, 0.693124, 0.699015,
        0.705529, 0.705594, 0.705262, 0.705794,
    ]
    np.testing.assert_allclose(out[0], golden, atol=1e-4)
