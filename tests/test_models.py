"""Model tests: shapes, rng plumbing, and behaviors that matter for parity
(prenet dropout at inference, upsampler attention, zoneout plumbing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viettts_tpu.config import (
    AcousticModelConfig,
    DurationModelConfig,
    HifiGanConfig,
)
from viettts_tpu.models import (
    AcousticModel,
    DurationModel,
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from viettts_tpu.types import AcousticBatch, DurationBatch

B, L = 2, 12


def _duration_batch():
    rng = np.random.RandomState(0)
    return DurationBatch(
        phonemes=jnp.asarray(rng.randint(0, 93, (B, L)), jnp.int32),
        lengths=jnp.asarray([L, L - 4], jnp.int32),
        durations=jnp.asarray(rng.rand(B, L).astype(np.float32)),
    )


def _acoustic_batch(n_frames=24):
    rng = np.random.RandomState(1)
    durations = rng.rand(B, L).astype(np.float32)
    durations = durations / durations.sum(axis=1, keepdims=True) * n_frames
    return AcousticBatch(
        phonemes=jnp.asarray(rng.randint(0, 93, (B, L)), jnp.int32),
        lengths=jnp.asarray([L, L - 4], jnp.int32),
        durations=jnp.asarray(durations),
        wavs=None,
        wav_lengths=None,
        mels=jnp.asarray(rng.randn(B, n_frames, 80).astype(np.float32)),
    )


# ---------------------------------------------------------------------------
# Duration model.
# ---------------------------------------------------------------------------


def test_duration_model_shapes():
    cfg = DurationModelConfig(lstm_dim=32)
    model = DurationModel(cfg)
    batch = _duration_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    out = model.apply(
        variables,
        batch,
        train=False,
        mutable=False,
    )
    assert out.shape == (B, L)
    assert np.all(np.asarray(out) >= 0)  # softplus output


def test_duration_model_train_needs_dropout_rng():
    cfg = DurationModelConfig(lstm_dim=32)
    model = DurationModel(cfg)
    batch = _duration_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    out, updates = model.apply(
        variables,
        batch,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out.shape == (B, L)
    assert "batch_stats" in updates


# ---------------------------------------------------------------------------
# Acoustic model.
# ---------------------------------------------------------------------------


def _acoustic_model_and_vars(n_frames=24):
    cfg = AcousticModelConfig(
        encoder_dim=32, decoder_dim=48, prenet_dim=16, postnet_dim=24, mel_dim=80
    )
    model = AcousticModel(cfg)
    batch = _acoustic_batch(n_frames)
    variables = model.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "prenet": jax.random.PRNGKey(2),
            "zoneout": jax.random.PRNGKey(3),
        },
        batch,
        train=True,
    )
    return cfg, model, variables, batch


def test_acoustic_teacher_forced_shapes():
    n_frames = 24
    cfg, model, variables, batch = _acoustic_model_and_vars(n_frames)
    (mel1, mel2), updates = model.apply(
        variables,
        batch,
        train=True,
        rngs={
            "dropout": jax.random.PRNGKey(4),
            "prenet": jax.random.PRNGKey(5),
            "zoneout": jax.random.PRNGKey(6),
        },
        mutable=["batch_stats", "intermediates"],
    )
    assert mel1.shape == (B, n_frames, 80)
    assert mel2.shape == (B, n_frames, 80)
    attn = updates["intermediates"]["attn"][0]
    assert attn.shape == (n_frames, L)
    # softmax rows sum to 1
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


def test_acoustic_inference_shapes_and_prenet_dropout():
    n_frames = 24
    cfg, model, variables, batch = _acoustic_model_and_vars(n_frames)
    params = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }

    def run(seed):
        return model.apply(
            params,
            batch.phonemes,
            batch.durations,
            n_frames,
            batch.lengths,
            method=AcousticModel.inference,
            rngs={"prenet": jax.random.PRNGKey(seed)},
        )

    mel_a = run(0)
    mel_b = run(0)
    mel_c = run(9)
    assert mel_a.shape == (B, n_frames, 80)
    # same rng -> deterministic; different rng -> different (prenet dropout
    # stays on at inference, reproducing reference model.py:95-100)
    np.testing.assert_allclose(np.asarray(mel_a), np.asarray(mel_b), atol=1e-6)
    assert np.abs(np.asarray(mel_a) - np.asarray(mel_c)).max() > 1e-4


def test_acoustic_inference_dropout_off_is_deterministic():
    n_frames = 16
    cfg = AcousticModelConfig(
        encoder_dim=32,
        decoder_dim=48,
        prenet_dim=16,
        postnet_dim=24,
        prenet_dropout_at_inference=False,
    )
    model = AcousticModel(cfg)
    batch = _acoustic_batch(n_frames)
    variables = model.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "prenet": jax.random.PRNGKey(2),
            "zoneout": jax.random.PRNGKey(3),
        },
        batch,
        train=True,
    )
    params = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }
    mel = model.apply(
        params,
        batch.phonemes,
        batch.durations,
        n_frames,
        batch.lengths,
        method=AcousticModel.inference,
    )
    assert mel.shape == (B, n_frames, 80)


def test_upsample_attention_focuses_on_correct_token():
    """A token with a long duration must dominate the frames under it."""
    cfg, model, variables, batch = _acoustic_model_and_vars()
    durations = np.zeros((1, 4), np.float32)
    durations[0] = [2.0, 10.0, 2.0, 2.0]
    x = jnp.asarray(np.eye(4, dtype=np.float32))[None]  # [1, 4, 4] one-hot

    out, _ = model.apply(
        variables,
        x,
        jnp.asarray(durations),
        16,
        method=AcousticModel.upsample,
        mutable=["intermediates"],
    )
    # frames 3..11 lie inside token 1's span; its weight should dominate
    w = np.asarray(out[0])  # [16, 4] (one-hot tokens pass weights through)
    assert np.argmax(w[6]) == 1
    assert np.argmax(w[1]) == 0


# ---------------------------------------------------------------------------
# HiFi-GAN.
# ---------------------------------------------------------------------------


def test_generator_upsamples_256x():
    cfg = HifiGanConfig(upsample_initial_channel=32)
    gen = Generator(cfg)
    mel = jnp.zeros((2, 11, 80), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(variables, mel)
    assert wav.shape == (2, 11 * 256, 1)
    assert np.all(np.abs(np.asarray(wav)) <= 1.0)


def test_generator_weight_norm_fold():
    from viettts_tpu.models.hifigan import fold_weight_norm

    cfg = HifiGanConfig(upsample_initial_channel=32)
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 7, 80), jnp.float32)
    gen_wn = Generator(cfg, use_wn=True)
    variables = gen_wn.init(jax.random.PRNGKey(0), mel)
    out_wn = gen_wn.apply(variables, mel)

    folded = fold_weight_norm(variables["params"])
    gen_plain = Generator(cfg, use_wn=False)
    out_plain = gen_plain.apply({"params": folded}, mel)
    np.testing.assert_allclose(
        np.asarray(out_wn), np.asarray(out_plain), atol=1e-5
    )


def test_discriminators_run():
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(2, 2048, 1).astype(np.float32) * 0.1)
    y_hat = jnp.asarray(rng.randn(2, 2048, 1).astype(np.float32) * 0.1)

    # small base_channels: channel ladders scale, layer structure identical
    mpd = MultiPeriodDiscriminator(base_channels=2)
    vars_p = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    r_outs, g_outs, r_fmaps, g_fmaps = mpd.apply(vars_p, y, y_hat)
    assert len(r_outs) == 5 and len(g_fmaps) == 5
    assert all(len(f) == 6 for f in r_fmaps)

    msd = MultiScaleDiscriminator(base_channels=16)
    vars_s = msd.init(jax.random.PRNGKey(1), y, y_hat)
    r_outs, g_outs, r_fmaps, g_fmaps = msd.apply(vars_s, y, y_hat)
    assert len(r_outs) == 3
    assert all(len(f) == 8 for f in r_fmaps)


def test_gan_losses():
    from viettts_tpu.models.hifigan import (
        discriminator_loss,
        feature_matching_loss,
        generator_adversarial_loss,
    )

    real = [jnp.ones((2, 10))]
    fake = [jnp.zeros((2, 10))]
    # perfect discriminator -> zero loss
    assert float(discriminator_loss(real, fake)) == 0.0
    # perfectly fooled -> zero generator loss
    assert float(generator_adversarial_loss(real)) == 0.0
    fm = feature_matching_loss([[jnp.ones((2, 3))]], [[jnp.zeros((2, 3))]])
    np.testing.assert_allclose(float(fm), 2.0)
