"""Direct parity against the ACTUAL reference implementation.

Unlike tests/test_checkpoint_parity.py (which verifies our converters
against hand-built haiku stand-ins), these tests import the real
``vietTTS`` package from /root/reference, initialize the reference's own
``hk.transform_with_state`` networks at the real FLAGS dimensions
(duration_lstm_dim=256, acoustic_decoder_dim=512, the full HiFi-GAN
config.json), save them in the reference's exact on-disk pickle formats,
load them through ``viettts_tpu.train.checkpoint.load_variables``, and
assert forward-pass parity — retiring the "stand-in silently diverges
from the real model.py" risk.

Import shims (the container lacks some reference deps):

* ``librosa.filters.mel`` -> our Slaney filterbank (ops/mel.py) — the one
  librosa call the reference makes (dsp.py:108-112).
* ``textgrid`` -> empty module (only needed by data-loading paths we
  don't exercise).
* ``jax.tree_map`` -> ``jax.tree.map`` (removed in modern jax; the
  reference model.py:41,163 uses it).

Stochastic layers are neutralized identically on both sides so the
comparison is deterministic: the reference applies prenet dropout even at
inference (model.py:95-100) and zoneout even at eval (model.py:154-166);
we patch ``hk.dropout`` to identity and the zoneout bernoulli to all-zero
("keep new state") for the reference net, and disable
``prenet_dropout_at_inference`` on ours.  Everything else — embeddings,
convs, eval-mode BatchNorm with EMA stats, the reset-core bi-LSTM,
Gaussian upsampling, the autoregressive decoder, postnet, and the full
HiFi-GAN generator — is compared exactly against the reference code.

Reference call paths covered: nat/model.py (all three modules),
nat/text2mel.py:22-117 (predict_duration, predict_mel, text2mel),
nat/dsp.py:104-128 (MelFilter), hifigan/model.py:77-125 (Generator).
"""

import dataclasses
import pickle
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.models import AcousticModel, DurationModel, Generator
from viettts_tpu.ops.mel import LogMelSpectrogram, mel_filterbank
from viettts_tpu.text import load_lexicon, normalize_text, text_to_tokens
from viettts_tpu.train.checkpoint import load_variables
from viettts_tpu.types import AcousticBatch, DurationBatch

REFERENCE = Path("/root/reference")


# ---------------------------------------------------------------------------
# Reference import harness.
# ---------------------------------------------------------------------------


def _install_shims():
    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")

        def mel(*, sr, n_fft, n_mels, fmin, fmax):
            return np.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))

        filters.mel = mel
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    if "textgrid" not in sys.modules:
        sys.modules["textgrid"] = types.ModuleType("textgrid")
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map


@pytest.fixture(scope="module")
def ref():
    """Import the real reference package and hand back its modules."""
    if not (REFERENCE / "vietTTS").is_dir():
        pytest.skip("reference checkout not available")
    _install_shims()
    sys.path.insert(0, str(REFERENCE))
    try:
        import vietTTS.hifigan.mel2wave as hifigan_mel2wave
        import vietTTS.hifigan.model as hifigan_model
        import vietTTS.nat.config as nat_config
        import vietTTS.nat.dsp as nat_dsp
        import vietTTS.nat.model as nat_model
        import vietTTS.nat.text2mel as nat_text2mel
    finally:
        sys.path.remove(str(REFERENCE))
    import haiku as hk

    return types.SimpleNamespace(
        hk=hk,
        config=nat_config,
        dsp=nat_dsp,
        model=nat_model,
        text2mel=nat_text2mel,
        hifigan_model=hifigan_model,
        hifigan_mel2wave=hifigan_mel2wave,
    )


def _plain(tree):
    """haiku FlatMap -> plain nested dict of numpy arrays (what the
    reference pickles actually contain)."""
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _plain(v) for k, v in tree.items()}
    return np.asarray(tree)


def _randomize_bn_state(state, rng):
    """Fresh haiku init leaves BN EMA averages all-zero (eval would divide
    by sqrt(0+eps)); give them realistic values so parity is meaningful."""
    new = {}
    for k, v in state.items():
        if k.endswith("mean_ema"):
            new[k] = dict(
                v,
                average=jnp.asarray(
                    rng.randn(*np.shape(v["average"])), jnp.float32
                )
                * 0.1,
            )
        elif k.endswith("var_ema"):
            new[k] = dict(
                v,
                average=jnp.asarray(
                    rng.rand(*np.shape(v["average"])) + 0.5, jnp.float32
                ),
            )
        else:
            new[k] = v
    return new


def _save_reference_ckpt(path, params, state):
    """Write the reference trainer's exact pickle format
    (duration_trainer.py / acoustic_trainer.py checkpoint dict)."""
    with open(path, "wb") as f:
        pickle.dump(
            {
                "step": 0,
                "params": _plain(params),
                "aux": _plain(state),
                "rng": np.asarray(jax.random.PRNGKey(7)),
                "optim_state": (),
            },
            f,
        )


def _patch_stochastic(monkeypatch, ref):
    """Neutralize the reference's always-on stochastic layers: hk.dropout
    (prenet/postnet/encoder dropout) -> identity; the zoneout bernoulli
    (model.py:163) -> all-False, i.e. always take the new LSTM state."""
    monkeypatch.setattr(ref.hk, "dropout", lambda rng, rate, x: x)

    def no_bernoulli(key, p=0.5, shape=None):
        return jnp.zeros(() if shape is None else shape, jnp.bool_)

    monkeypatch.setattr(jax.random, "bernoulli", no_bernoulli)


# ---------------------------------------------------------------------------
# Module-level parity.
# ---------------------------------------------------------------------------


def test_duration_parity_vs_reference(ref, tmp_path):
    """Real reference DurationModel (eval) == ours after checkpoint
    conversion, at the real 256-dim config.  Eval mode is fully
    deterministic (no dropout), so the tolerance is tight."""
    hk = ref.hk
    rng = np.random.RandomState(0)
    toks = rng.randint(4, 90, (2, 11)).astype(np.int32)
    batch = ref.config.DurationInput(
        phonemes=jnp.asarray(toks),
        lengths=jnp.asarray([11, 7], jnp.int32),
        durations=None,
    )

    train_net = hk.transform_with_state(
        lambda x: ref.model.DurationModel(is_training=True)(x)
    )
    params, state = train_net.init(jax.random.PRNGKey(0), batch)
    state = _randomize_bn_state(_plain(state), rng)
    eval_net = hk.transform_with_state(
        lambda x: ref.model.DurationModel(is_training=False)(x)
    )
    want, _ = eval_net.apply(params, state, None, batch)

    path = tmp_path / "duration_latest_ckpt.pickle"
    _save_reference_ckpt(path, params, state)
    variables = load_variables(path, "duration")
    got = DurationModel(Config().duration).apply(
        variables,
        DurationBatch(batch.phonemes, batch.lengths, None),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


def test_acoustic_teacher_forced_parity_vs_reference(ref, tmp_path, monkeypatch):
    """Real reference AcousticModel.__call__ (eval, stochasticity
    neutralized) == ours, at the real 256/512-dim config: encoder,
    Gaussian upsampler, prenet, skip-connected 2-layer LSTM decoder, mel
    projection and postnet with eval BatchNorm."""
    hk = ref.hk
    rng = np.random.RandomState(1)
    B, T, L = 2, 7, 26
    mel_dim = ref.config.FLAGS.mel_dim
    durations = (rng.rand(B, T).astype(np.float32) * 6.0).clip(1.0)
    mels_in = rng.randn(B, L, mel_dim).astype(np.float32)
    batch = ref.config.AcousticInput(
        phonemes=jnp.asarray(rng.randint(4, 90, (B, T)).astype(np.int32)),
        lengths=jnp.asarray([T, T - 3], jnp.int32),
        durations=jnp.asarray(durations),
        wavs=None,
        wav_lengths=None,
        mels=jnp.asarray(mels_in),
    )

    train_net = hk.transform_with_state(
        lambda x: ref.model.AcousticModel(is_training=True)(x)
    )
    params, state = train_net.init(jax.random.PRNGKey(0), batch)
    state = _randomize_bn_state(_plain(state), rng)

    _patch_stochastic(monkeypatch, ref)
    eval_net = hk.transform_with_state(
        lambda x: ref.model.AcousticModel(is_training=False)(x)
    )
    (want1, want2), _ = eval_net.apply(
        params, state, jax.random.PRNGKey(1), batch
    )

    path = tmp_path / "acoustic_latest_ckpt.pickle"
    _save_reference_ckpt(path, params, state)
    variables = load_variables(path, "acoustic")
    cfg = dataclasses.replace(
        Config().acoustic, prenet_dropout_at_inference=False
    )
    got1, got2 = AcousticModel(cfg).apply(
        variables,
        AcousticBatch(
            phonemes=batch.phonemes,
            lengths=batch.lengths,
            durations=batch.durations,
            wavs=None,
            wav_lengths=None,
            mels=batch.mels,
        ),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got1), np.asarray(want1), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want2), atol=2e-4
    )


def test_acoustic_inference_parity_vs_reference(ref, tmp_path, monkeypatch):
    """Real reference AcousticModel.inference (the autoregressive decode,
    model.py:123-144) == our scan decode, prenet dropout neutralized on
    both sides."""
    hk = ref.hk
    rng = np.random.RandomState(2)
    T = 6
    toks = rng.randint(4, 90, (1, T)).astype(np.int32)
    durations = (rng.rand(1, T).astype(np.float32) * 8.0).clip(2.0)
    n_frames = int(durations.sum())

    init_batch = ref.config.AcousticInput(
        phonemes=jnp.asarray(toks),
        lengths=jnp.asarray([T], jnp.int32),
        durations=jnp.asarray(durations),
        wavs=None,
        wav_lengths=None,
        mels=jnp.zeros((1, n_frames, ref.config.FLAGS.mel_dim), jnp.float32),
    )
    train_net = hk.transform_with_state(
        lambda x: ref.model.AcousticModel(is_training=True)(x)
    )
    params, state = train_net.init(jax.random.PRNGKey(0), init_batch)
    state = _randomize_bn_state(_plain(state), rng)

    _patch_stochastic(monkeypatch, ref)
    infer_net = hk.transform_with_state(
        lambda t, d, n: ref.model.AcousticModel(is_training=False).inference(
            t, d, n
        )
    )
    want, _ = infer_net.apply(
        params,
        state,
        jax.random.PRNGKey(3),
        jnp.asarray(toks),
        jnp.asarray(durations),
        n_frames,
    )

    path = tmp_path / "acoustic_latest_ckpt.pickle"
    _save_reference_ckpt(path, params, state)
    variables = load_variables(path, "acoustic")
    cfg = dataclasses.replace(
        Config().acoustic, prenet_dropout_at_inference=False
    )
    got = AcousticModel(cfg).apply(
        variables,
        jnp.asarray(toks),
        jnp.asarray(durations),
        n_frames,
        jnp.asarray([T], jnp.int32),
        method=AcousticModel.inference,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_hifigan_generator_parity_vs_reference(ref, tmp_path):
    """Real reference HiFi-GAN Generator (hifigan/model.py:77-125) built
    from the real assets/hifigan/config.json == ours, via the hk_hifi
    pickle format.  Fully deterministic -> tight tolerance."""
    hk = ref.hk
    import json

    with open(REFERENCE / "assets" / "hifigan" / "config.json") as f:
        h = ref.hifigan_mel2wave.AttrDict(json.loads(f.read()))

    rng = np.random.RandomState(3)
    mel = jnp.asarray(rng.randn(1, 6, h.num_mels).astype(np.float32))

    net = hk.transform_with_state(
        lambda x: ref.hifigan_model.Generator(h)(x)
    )
    params, state = net.init(jax.random.PRNGKey(0), mel)
    assert not state, "reference Generator is stateless"
    want, _ = net.apply(params, state, None, mel)

    path = tmp_path / "hk_hifi.pickle"
    with open(path, "wb") as f:
        pickle.dump(_plain(params), f)
    variables = load_variables(path, "hifigan")

    from viettts_tpu.config import HifiGanConfig

    cfg = HifiGanConfig.from_json(
        REFERENCE / "assets" / "hifigan" / "config.json"
    )
    got = Generator(cfg).apply(variables, mel)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


def test_melfilter_parity_vs_reference(ref):
    """Our matmul-DFT LogMelSpectrogram == the reference's FFT-based
    MelFilter (dsp.py:104-128) on the same waveform.  The filterbank is
    shared via the shim, so this checks framing, padding, windowing, the
    DFT and the log/clip — the whole acoustic-loss input path."""
    cfg = Config().dsp
    mf = ref.dsp.MelFilter(
        cfg.sample_rate, cfg.n_fft, cfg.mel_dim, cfg.fmin, cfg.fmax
    )
    rng = np.random.RandomState(4)
    wav = jnp.asarray(
        (rng.rand(2, 4096).astype(np.float32) - 0.5) * 1.6
    )
    want = np.asarray(mf(wav))
    got = np.asarray(LogMelSpectrogram(cfg)(wav))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


# ---------------------------------------------------------------------------
# End-to-end: the reference's own text2mel() vs our pipeline.
# ---------------------------------------------------------------------------


def test_text2mel_end_to_end_parity_vs_reference(ref, tmp_path, monkeypatch):
    """Run the reference's actual ``text2mel`` (nat/text2mel.py:85-103,
    including its duration postprocess and trailing-silence trim) from
    checkpoints we wrote in its format, against our frontend + models on
    the same text, with the real 7893-entry lexicon."""
    hk = ref.hk
    rng = np.random.RandomState(5)
    text = "hôm qua em tới trường"
    lexicon_path = REFERENCE / "assets" / "infore" / "lexicon.txt"
    silence_duration = 0.5

    # --- token parity (text frontend) ---
    norm = normalize_text(text)
    ref_tokens = ref.text2mel.text2tokens(norm, lexicon_path)
    my_tokens = text_to_tokens(norm, load_lexicon(lexicon_path))
    assert my_tokens == list(ref_tokens)
    T = len(ref_tokens)

    # --- build + save reference-format checkpoints ---
    dur_init = ref.config.DurationInput(
        jnp.zeros((1, T), jnp.int32), jnp.asarray([T], jnp.int32), None
    )
    dur_net = hk.transform_with_state(
        lambda x: ref.model.DurationModel(is_training=True)(x)
    )
    dparams, dstate = dur_net.init(jax.random.PRNGKey(0), dur_init)
    dstate = _randomize_bn_state(_plain(dstate), rng)
    _save_reference_ckpt(
        tmp_path / "duration_latest_ckpt.pickle", dparams, dstate
    )

    ac_init = ref.config.AcousticInput(
        jnp.zeros((1, T), jnp.int32),
        jnp.asarray([T], jnp.int32),
        jnp.ones((1, T), jnp.float32),
        None,
        None,
        jnp.zeros((1, 8, ref.config.FLAGS.mel_dim), jnp.float32),
    )
    ac_net = hk.transform_with_state(
        lambda x: ref.model.AcousticModel(is_training=True)(x)
    )
    aparams, astate = ac_net.init(jax.random.PRNGKey(1), ac_init)
    astate = _randomize_bn_state(_plain(astate), rng)
    _save_reference_ckpt(
        tmp_path / "acoustic_latest_ckpt.pickle", aparams, astate
    )

    # --- run the reference's own inference entry point ---
    _patch_stochastic(monkeypatch, ref)
    monkeypatch.setattr(ref.config.FLAGS, "ckpt_dir", tmp_path)
    monkeypatch.setattr(
        ref.text2mel.FLAGS, "ckpt_dir", tmp_path, raising=False
    )
    want = np.asarray(
        ref.text2mel.text2mel(norm, lexicon_path, silence_duration)
    )[0]

    # --- ours: same checkpoints through our loaders + models ---
    dvars = load_variables(tmp_path / "duration_latest_ckpt.pickle", "duration")
    avars = load_variables(tmp_path / "acoustic_latest_ckpt.pickle", "acoustic")
    cfg = Config()
    toks = jnp.asarray(np.asarray(my_tokens, np.int32)[None, :])
    lengths = jnp.asarray([T], jnp.int32)
    dur_s = np.asarray(
        DurationModel(cfg.duration).apply(
            dvars, DurationBatch(toks, lengths, None), train=False
        )
    )
    # duration postprocess (reference text2mel.py:90-97)
    tok_row = np.asarray(my_tokens)[None, :]
    dur_s = np.where(
        tok_row == ref.config.FLAGS.sil_index,
        np.clip(dur_s, silence_duration, None),
        dur_s,
    )
    dur_s = np.where(tok_row == ref.config.FLAGS.word_end_index, 0.0, dur_s)
    fps = cfg.dsp.sample_rate / cfg.dsp.hop_length
    dur_frames = dur_s * fps
    n_frames = int(dur_frames.sum())

    acfg = dataclasses.replace(
        cfg.acoustic, prenet_dropout_at_inference=False
    )
    mel = np.asarray(
        AcousticModel(acfg).apply(
            avars,
            toks,
            jnp.asarray(dur_frames),
            n_frames,
            lengths,
            method=AcousticModel.inference,
        )
    )[0]
    # trailing-silence trim (reference text2mel.py:99-102)
    assert my_tokens[-1] == ref.config.FLAGS.sil_index
    trim = int(dur_s[0, -1] * fps)
    mel = mel[: mel.shape[0] - trim]

    assert mel.shape == want.shape
    np.testing.assert_allclose(mel, want, atol=1e-3)
    # the bulk of the sequence should agree much tighter than the 1e-3
    # contract (AR error accumulation stays small)
    assert float(np.abs(mel - want).mean()) < 1e-4
