"""Checkpoint conversion parity tests.

These build small *haiku* networks shaped exactly like the reference models
(same module types, creation order and names — the on-disk checkpoint
format), initialize them randomly, convert the haiku trees with our
converters, and assert that our flax models reproduce the haiku forward
pass.  This is the guarantee that real reference checkpoints
(duration_latest_ckpt.pickle / acoustic_latest_ckpt.pickle / hk_hifi.pickle)
load correctly.
"""

import numpy as np
import pytest

import haiku as hk
import jax
import jax.numpy as jnp

from viettts_tpu.config import AcousticModelConfig, DurationModelConfig, HifiGanConfig
from viettts_tpu.models import AcousticModel, DurationModel, Generator
from viettts_tpu.train.checkpoint import (
    convert_haiku_acoustic,
    convert_haiku_duration,
    convert_haiku_hifigan,
    load_checkpoint,
    save_checkpoint,
)
from viettts_tpu.types import AcousticBatch, DurationBatch

VOCAB, DIM = 16, 8


# ---------------------------------------------------------------------------
# Haiku oracles (checkpoint-format stand-ins for the reference nets).
# ---------------------------------------------------------------------------


class HkTokenEncoder(hk.Module):
    def __init__(self, dim, name="token_encoder"):
        super().__init__(name=name)
        self.embed = hk.Embed(VOCAB, dim)
        self.convs = [hk.Conv1D(dim, 3, padding="SAME") for _ in range(3)]
        self.bns = [hk.BatchNorm(True, True, 0.9) for _ in range(3)]
        self.lstm_fwd = hk.LSTM(dim)
        self.lstm_bwd = hk.ResetCore(hk.LSTM(dim))

    def __call__(self, x, lengths, is_training=False):
        x = self.embed(x)
        for conv, bn in zip(self.convs, self.bns):
            x = jax.nn.relu(bn(conv(x), is_training=is_training))
        B, L, _ = x.shape
        mask = jnp.arange(L)[None, :] >= (lengths[:, None] - 1)
        out_f, _ = hk.dynamic_unroll(
            self.lstm_fwd, x, self.lstm_fwd.initial_state(B), time_major=False
        )
        xb = jnp.flip(x, 1)
        mb = jnp.flip(mask, 1)
        out_b, _ = hk.dynamic_unroll(
            self.lstm_bwd, (xb, mb), self.lstm_bwd.initial_state(B),
            time_major=False,
        )
        return jnp.concatenate([out_f, jnp.flip(out_b, 1)], axis=-1)


def _randomize_bn_state(state, rng):
    """Give EMA averages non-trivial values (fresh init would be all-zero
    variance, which eval-mode BN divides by)."""
    new = {}
    for k, v in state.items():
        if k.endswith("mean_ema"):
            new[k] = dict(v, average=jnp.asarray(rng.randn(*v["average"].shape), jnp.float32) * 0.1)
        elif k.endswith("var_ema"):
            new[k] = dict(v, average=jnp.asarray(rng.rand(*v["average"].shape) + 0.5, jnp.float32))
        else:
            new[k] = v
    return new


def test_duration_checkpoint_parity():
    def hk_fn(batch, is_training=False):
        class HkDurationModel(hk.Module):
            def __init__(self):
                super().__init__(name="duration_model")
                self.encoder = HkTokenEncoder(DIM)
                self.projection = hk.Sequential(
                    [hk.Linear(DIM), jax.nn.gelu, hk.Linear(1)]
                )

            def __call__(self, batch):
                x = self.encoder(
                    batch.phonemes, batch.lengths, is_training=is_training
                )
                return jax.nn.softplus(
                    jnp.squeeze(self.projection(x), axis=-1)
                )

        return HkDurationModel()(batch)

    rng = np.random.RandomState(0)
    batch = DurationBatch(
        phonemes=jnp.asarray(rng.randint(0, VOCAB, (2, 6)), jnp.int32),
        lengths=jnp.asarray([6, 4], jnp.int32),
        durations=None,
    )
    tf = hk.transform_with_state(hk_fn)
    hk_params, hk_state = tf.init(jax.random.PRNGKey(0), batch, is_training=True)
    hk_state = _randomize_bn_state(hk_state, rng)
    want, _ = tf.apply(hk_params, hk_state, None, batch)

    variables = convert_haiku_duration(hk_params, hk_state)
    model = DurationModel(DurationModelConfig(vocab_size=VOCAB, lstm_dim=DIM))
    got = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_acoustic_checkpoint_parity():
    n_frames, mel_dim, enc_dim, dec_dim, pre_dim = 10, 6, 8, 12, 4

    def hk_fn(batch, is_training=False):
        class HkAcousticModel(hk.Module):
            def __init__(self):
                super().__init__(name="acoustic_model")
                self.encoder = HkTokenEncoder(enc_dim)
                self.decoder = hk.deep_rnn_with_skip_connections(
                    [hk.LSTM(dec_dim), hk.LSTM(dec_dim)]
                )
                self.projection = hk.Linear(mel_dim)
                self.prenet_fc1 = hk.Linear(pre_dim, with_bias=False)
                self.prenet_fc2 = hk.Linear(pre_dim, with_bias=False)
                self.postnet_convs = [hk.Conv1D(8, 5) for _ in range(4)] + [
                    hk.Conv1D(mel_dim, 5)
                ]
                self.postnet_bns = [
                    hk.BatchNorm(True, True, 0.9) for _ in range(4)
                ] + [None]

            def upsample(self, x, durations, L):
                ruler = jnp.arange(0, L)[None, :]
                end_pos = jnp.cumsum(durations, axis=1)
                mid_pos = end_pos - durations / 2
                d2 = jnp.square(mid_pos[:, None, :] - ruler[:, :, None]) / 10.0
                w = jax.nn.softmax(-d2, axis=-1)
                return jnp.einsum("BLT,BTD->BLD", w, x)

            def __call__(self, batch):
                x = self.encoder(
                    batch.phonemes, batch.lengths, is_training=is_training
                )
                x = self.upsample(x, batch.durations, batch.mels.shape[1])
                # prenet without dropout (deterministic comparison)
                m = jax.nn.relu(self.prenet_fc1(batch.mels))
                m = jax.nn.relu(self.prenet_fc2(m))
                x = jnp.concatenate([x, m], axis=-1)
                B = x.shape[0]
                out, _ = hk.dynamic_unroll(
                    self.decoder, x, self.decoder.initial_state(B),
                    time_major=False,
                )
                mel = self.projection(out)
                z = mel
                for conv, bn in zip(self.postnet_convs, self.postnet_bns):
                    z = conv(z)
                    if bn is not None:
                        z = jnp.tanh(bn(z, is_training=is_training))
                return mel, mel + z

        return HkAcousticModel()(batch)

    rng = np.random.RandomState(1)
    durations = rng.rand(2, 5).astype(np.float32) * 3
    batch = AcousticBatch(
        phonemes=jnp.asarray(rng.randint(0, VOCAB, (2, 5)), jnp.int32),
        lengths=jnp.asarray([5, 3], jnp.int32),
        durations=jnp.asarray(durations),
        wavs=None,
        wav_lengths=None,
        mels=jnp.asarray(rng.randn(2, n_frames, mel_dim).astype(np.float32)),
    )
    tf = hk.transform_with_state(hk_fn)
    hk_params, hk_state = tf.init(jax.random.PRNGKey(0), batch, is_training=True)
    hk_state = _randomize_bn_state(hk_state, rng)
    (want1, want2), _ = tf.apply(hk_params, hk_state, None, batch)

    variables = convert_haiku_acoustic(hk_params, hk_state)
    cfg = AcousticModelConfig(
        vocab_size=VOCAB,
        encoder_dim=enc_dim,
        decoder_dim=dec_dim,
        prenet_dim=pre_dim,
        postnet_dim=8,
        mel_dim=mel_dim,
        prenet_dropout_at_inference=False,
    )
    model = AcousticModel(cfg)
    got1, got2 = model.apply(variables, batch, train=False)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-4)


def test_hifigan_checkpoint_parity():
    cfg = HifiGanConfig(
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=8,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),),
        mel_dim=6,
    )

    def hk_fn(x):
        class HkResBlock1(hk.Module):
            def __init__(self, channels, kernel, dilations, name):
                super().__init__(name=name)
                self.convs1 = [
                    hk.Conv1D(
                        channels, kernel, 1, rate=d,
                        padding=(((kernel * d - d) // 2,) * 2,),
                        name=f"convs1_{i}",
                    )
                    for i, d in enumerate(dilations)
                ]
                self.convs2 = [
                    hk.Conv1D(
                        channels, kernel, 1,
                        padding=(((kernel - 1) // 2,) * 2,),
                        name=f"convs2_{i}",
                    )
                    for i in range(len(dilations))
                ]

            def __call__(self, x):
                for c1, c2 in zip(self.convs1, self.convs2):
                    xt = jax.nn.leaky_relu(x, 0.1)
                    xt = c1(xt)
                    xt = jax.nn.leaky_relu(xt, 0.1)
                    xt = c2(xt)
                    x = xt + x
                return x

        class HkGenerator(hk.Module):
            def __init__(self):
                super().__init__(name="generator")
                self.conv_pre = hk.Conv1D(
                    cfg.upsample_initial_channel, 7, 1, padding=((3, 3),)
                )
                self.ups = [
                    hk.Conv1DTranspose(
                        cfg.upsample_initial_channel // (2 ** (i + 1)),
                        kernel_shape=k, stride=u, padding="SAME",
                        name=f"ups_{i}",
                    )
                    for i, (u, k) in enumerate(
                        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
                    )
                ]
                self.resblocks = []
                for i in range(len(self.ups)):
                    ch = cfg.upsample_initial_channel // (2 ** (i + 1))
                    for k, d in zip(
                        cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes
                    ):
                        self.resblocks.append(
                            HkResBlock1(
                                ch, k, d,
                                name=f"res_block1_{len(self.resblocks)}",
                            )
                        )
                self.conv_post = hk.Conv1D(1, 7, 1, padding=((3, 3),))

            def __call__(self, x):
                nk = len(cfg.resblock_kernel_sizes)
                x = self.conv_pre(x)
                for i in range(len(self.ups)):
                    x = jax.nn.leaky_relu(x, 0.1)
                    x = self.ups[i](x)
                    xs = None
                    for j in range(nk):
                        y = self.resblocks[i * nk + j](x)
                        xs = y if xs is None else xs + y
                    x = xs / nk
                x = jax.nn.leaky_relu(x)
                x = self.conv_post(x)
                return jnp.tanh(x)

        return HkGenerator()(x)

    rng = np.random.RandomState(2)
    mel = jnp.asarray(rng.randn(2, 9, cfg.mel_dim).astype(np.float32))
    tf = hk.transform(hk_fn)
    hk_params = tf.init(jax.random.PRNGKey(0), mel)
    want = tf.apply(hk_params, None, mel)

    # hk_hifi.pickle stores the flat {path: {w, b}} mapping directly.
    flat = {k: dict(v) for k, v in hk_params.items()}
    variables = convert_haiku_hifigan(
        flat, num_upsamples=2, num_resblocks=2, resblock_convs=3
    )
    gen = Generator(cfg)
    got = gen.apply(variables, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_native_checkpoint_roundtrip(tmp_path):
    payload = {
        "step": 7,
        "params": {"a": jnp.ones((2, 3)), "b": {"c": jnp.zeros(4)}},
        "rng": jax.random.PRNGKey(0),
    }
    path = tmp_path / "ckpt.pickle"
    save_checkpoint(path, payload)
    loaded = load_checkpoint(path)
    assert loaded["step"] == 7
    np.testing.assert_array_equal(loaded["params"]["a"], np.ones((2, 3)))
    assert load_checkpoint(tmp_path / "missing.pickle") is None
