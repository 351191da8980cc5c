"""Tacotron-2-style acoustic model: aligned phonemes -> 80-bin log-mel.

Architecture parity with the reference ``AcousticModel``
(/root/reference/vietTTS/nat/model.py:73-169):

* TokenEncoder (256 -> bi-LSTM -> 512-d conditioning).
* Duration-driven Gaussian upsampler replacing attention (model.py:102-111):
  frame f attends to token t with weight softmax_t(-(mid_t - f)^2 / sigma2).
* Prenet: 2 x Dense(256, no bias) + relu + dropout 0.5 — dropout stays on at
  inference, reproducing the reference quirk (model.py:95-100).
* Decoder: 2-layer LSTM with skip connections (layer 2 consumes
  [input, h1]; output is [h1, h2]), zoneout 0.1 on both states in training.
* Linear projection to mel, then a 5-layer postnet producing a residual.

TPU-first design notes
----------------------
The sequential decode is a single ``lax.scan`` whose per-step work is
minimized: the conditioning contribution to both LSTM layers' gates
(``cond @ W``) is precomputed for *all* frames as large MXU matmuls before
the scan; prenet dropout masks and zoneout masks are batch-sampled outside
the scan.  Inside the scan only the feedback path remains: prenet on the
previous frame, two recurrent matmuls, and the mel projection.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viettts_tpu.config import AcousticModelConfig
from viettts_tpu.models.encoder import TokenEncoder, lstm_param_init
from viettts_tpu.ops.rnn import LSTMParams, LSTMState, zero_state
from viettts_tpu.types import AcousticBatch


def _gates_step(
    params: LSTMParams, gates_in: jax.Array, state: LSTMState
) -> Tuple[jax.Array, LSTMState]:
    """LSTM step from pre-accumulated input gates (recurrent term added
    here).  Matches hk.LSTM gate math (i, g, f, o; forget bias +1)."""
    gates = gates_in + state.h @ params.w_h
    i, g, f, o = jnp.split(gates, 4, axis=-1)
    f = jax.nn.sigmoid(f + 1.0)
    c = f * state.c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, LSTMState(h=h, c=c)


def _dense_init(in_dim: int, out_dim: int, with_bias: bool = True):
    """hk.Linear-style init: truncated normal, stddev 1/sqrt(fan_in)."""

    def init(key, _shape=None, dtype=jnp.float32):
        stddev = 1.0 / jnp.sqrt(jnp.asarray(in_dim, dtype))
        w = stddev * jax.random.truncated_normal(
            key, -2.0, 2.0, (in_dim, out_dim), dtype
        )
        if with_bias:
            return {"kernel": w, "bias": jnp.zeros((out_dim,), dtype)}
        return {"kernel": w}

    return init


class AcousticModel(nn.Module):
    cfg: AcousticModelConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = TokenEncoder(
            vocab_size=cfg.vocab_size,
            lstm_dim=cfg.encoder_dim,
            dropout_rate=cfg.encoder_dropout_rate,
            name="encoder",
        )
        cond_dim = 2 * cfg.encoder_dim
        in1 = cond_dim + cfg.prenet_dim
        in2 = in1 + cfg.decoder_dim
        self.lstm1 = self.param(
            "decoder_lstm1", lstm_param_init(in1, cfg.decoder_dim)
        )
        self.lstm2 = self.param(
            "decoder_lstm2", lstm_param_init(in2, cfg.decoder_dim)
        )
        # Prenet and mel projection as raw params: they are used inside the
        # decode lax.scan, where flax submodule calls are off-limits.
        self.prenet_k1 = self.param(
            "prenet_fc1", _dense_init(cfg.mel_dim, cfg.prenet_dim, False)
        )["kernel"]
        self.prenet_k2 = self.param(
            "prenet_fc2", _dense_init(cfg.prenet_dim, cfg.prenet_dim, False)
        )["kernel"]
        proj = self.param(
            "projection", _dense_init(2 * cfg.decoder_dim, cfg.mel_dim)
        )
        self.proj_kernel = proj["kernel"]
        self.proj_bias = proj["bias"]
        self.postnet_convs = [
            nn.Conv(cfg.postnet_dim, (5,), padding="SAME", name=f"postnet_conv_{i}")
            for i in range(4)
        ] + [nn.Conv(cfg.mel_dim, (5,), padding="SAME", name="postnet_conv_4")]
        self.postnet_bns = [
            nn.BatchNorm(
                use_running_average=None,
                momentum=0.9,
                epsilon=1e-5,
                name=f"postnet_bn_{i}",
            )
            for i in range(4)
        ]

    # ------------------------------------------------------------------
    # Sub-blocks.
    # ------------------------------------------------------------------

    def _dropout(self, key: jax.Array, rate: float, x: jax.Array) -> jax.Array:
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0)

    def upsample(
        self,
        x: jax.Array,
        durations: jax.Array,
        n_frames: int,
        token_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Gaussian upsampling: [B, T, D] tokens -> [B, L, D] frames.

        ``durations`` are in frames.  Weight of token t for output frame f is
        softmax over tokens of -(mid_t - f)^2 / sigma2 (reference
        model.py:102-111).  ``token_mask`` [B, T] excludes padding tokens
        from the softmax — needed for batched inference where sequences are
        padded (the reference only ever upsamples unpadded B=1 input).
        """
        frame_pos = jnp.arange(n_frames, dtype=jnp.float32)[None, :]  # [1, L]
        end_pos = jnp.cumsum(durations, axis=1)  # [B, T]
        mid_pos = end_pos - durations / 2.0  # [B, T]
        d2 = jnp.square(mid_pos[:, None, :] - frame_pos[:, :, None])
        logits = -d2 / self.cfg.upsample_sigma2
        if token_mask is not None:
            logits = jnp.where(token_mask[:, None, :], logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1)  # [B,L,T]
        self.sow("intermediates", "attn", w[0])
        return jnp.einsum(
            "blt,btd->bld", w, x, preferred_element_type=jnp.float32
        )

    def _prenet_static(self, x: jax.Array, deterministic: bool) -> jax.Array:
        """Prenet on a full [.., D] tensor (teacher forcing path)."""
        rate = self.cfg.prenet_dropout_rate
        x = jax.nn.relu(x @ self.prenet_k1)
        if not deterministic:
            x = self._dropout(self.make_rng("prenet"), rate, x)
        x = jax.nn.relu(x @ self.prenet_k2)
        if not deterministic:
            x = self._dropout(self.make_rng("prenet"), rate, x)
        return x

    def postnet(self, mel: jax.Array, *, train: bool) -> jax.Array:
        x = mel
        for i, conv in enumerate(self.postnet_convs):
            x = conv(x)
            if i < 4:
                x = self.postnet_bns[i](x, use_running_average=not train)
                x = jnp.tanh(x)
            if train:
                x = self._dropout(
                    self.make_rng("dropout"), self.cfg.postnet_dropout_rate, x
                )
        return x

    # ------------------------------------------------------------------
    # Teacher-forced training forward.
    # ------------------------------------------------------------------

    def __call__(
        self, batch: AcousticBatch, *, train: bool
    ) -> Tuple[jax.Array, jax.Array]:
        """Teacher-forced forward.  ``batch.mels`` are the shifted decoder
        inputs (go-frame + ground truth), ``batch.durations`` in frames.
        Returns (mel_before_postnet, mel_after_postnet)."""
        cfg = self.cfg
        enc = self.encoder(batch.phonemes, batch.lengths, train=train)
        n_frames = batch.mels.shape[1]
        cond = self.upsample(enc, batch.durations, n_frames)  # [B, L, C]
        pre = self._prenet_static(
            batch.mels,
            deterministic=not train and not cfg.prenet_dropout_at_inference,
        )  # [B, L, P]
        x = jnp.concatenate([cond, pre], axis=-1)  # [B, L, C+P]
        B, L, _ = x.shape
        H = cfg.decoder_dim

        # Precompute per-frame input gates for both layers (MXU matmuls).
        g1 = x @ self.lstm1.w_i + self.lstm1.b  # [B, L, 4H]
        g2x = x @ self.lstm2.w_i[: x.shape[-1]] + self.lstm2.b  # [B, L, 4H]
        w2_h1 = self.lstm2.w_i[x.shape[-1] :]  # [H, 4H] (h1 contribution)

        if train:
            keys = jax.random.split(self.make_rng("zoneout"), 4)
            zmask = tuple(
                jax.random.bernoulli(k, cfg.zoneout_rate, (L, B, H))
                for k in keys
            )  # keep-previous masks for (h1, c1, h2, c2)
        else:
            zeros = jnp.zeros((L, B, H), jnp.bool_)
            zmask = (zeros, zeros, zeros, zeros)

        lstm1, lstm2 = self.lstm1, self.lstm2

        def step(carry, inp):
            s1, s2 = carry
            g1_t, g2x_t, mh1, mc1, mh2, mc2 = inp
            h1, ns1 = _gates_step(lstm1, g1_t, s1)
            g2_t = g2x_t + h1 @ w2_h1
            h2, ns2 = _gates_step(lstm2, g2_t, s2)
            # Zoneout: keep previous state where the mask is set; the step
            # output uses the raw (pre-zoneout) activations, matching the
            # reference (model.py:154-166).
            ns1 = LSTMState(
                h=jnp.where(mh1, s1.h, ns1.h), c=jnp.where(mc1, s1.c, ns1.c)
            )
            ns2 = LSTMState(
                h=jnp.where(mh2, s2.h, ns2.h), c=jnp.where(mc2, s2.c, ns2.c)
            )
            return (ns1, ns2), jnp.concatenate([h1, h2], axis=-1)

        init = (zero_state(B, H, x.dtype), zero_state(B, H, x.dtype))
        xs = (
            jnp.swapaxes(g1, 0, 1),
            jnp.swapaxes(g2x, 0, 1),
        ) + zmask
        _, hs = jax.lax.scan(step, init, xs)  # [L, B, 2H]
        hs = jnp.swapaxes(hs, 0, 1)  # [B, L, 2H]

        mel = hs @ self.proj_kernel + self.proj_bias
        residual = self.postnet(mel, train=train)
        return mel, mel + residual

    # ------------------------------------------------------------------
    # Autoregressive inference.
    # ------------------------------------------------------------------

    def inference(
        self,
        phonemes: jax.Array,
        durations: jax.Array,
        n_frames: int,
        lengths: Optional[jax.Array] = None,
        use_pallas: bool = False,
    ) -> jax.Array:
        """Autoregressive decode: [B, T] tokens + [B, T] frame durations ->
        [B, n_frames, mel_dim] log-mels (post-postnet).

        The previous predicted frame is fed back through the prenet.  Prenet
        dropout remains active when cfg.prenet_dropout_at_inference — the rng
        comes from the 'prenet' stream.
        """
        cfg = self.cfg
        B, T = phonemes.shape
        if lengths is None:
            lengths = jnp.full((B,), T, dtype=jnp.int32)
        enc = self.encoder(phonemes, lengths, train=False)
        token_mask = jnp.arange(T)[None, :] < lengths[:, None]
        cond = self.upsample(enc, durations, n_frames, token_mask)  # [B,L,C]
        L = n_frames
        H = cfg.decoder_dim
        C = cond.shape[-1]
        P = cfg.prenet_dim

        # Conditioning contribution to both layers' gates, precomputed for
        # all frames as MXU matmuls.
        g1c = cond @ self.lstm1.w_i[:C] + self.lstm1.b  # [B, L, 4H]
        g2c = cond @ self.lstm2.w_i[:C] + self.lstm2.b  # [B, L, 4H]
        w1_p = self.lstm1.w_i[C : C + P]  # prenet -> layer1 gates
        w2_p = self.lstm2.w_i[C : C + P]
        w2_h1 = self.lstm2.w_i[C + P :]

        # Mel projection split: concat(h1, h2) @ W == h1 @ W1 + h2 @ W2.
        wp1, wp2 = self.proj_kernel[:H], self.proj_kernel[H:]
        proj_bias = self.proj_bias

        # Prenet dropout masks for every step, sampled outside the scan.
        rate = cfg.prenet_dropout_rate
        if cfg.prenet_dropout_at_inference:
            k1, k2 = jax.random.split(self.make_rng("prenet"))
            keep1 = jax.random.bernoulli(k1, 1.0 - rate, (L, B, P))
            keep2 = jax.random.bernoulli(k2, 1.0 - rate, (L, B, P))
            scale = 1.0 / (1.0 - rate)
        else:
            keep1 = jnp.ones((L, B, P), jnp.bool_)
            keep2 = jnp.ones((L, B, P), jnp.bool_)
            scale = 1.0

        k_fc1, k_fc2 = self.prenet_k1, self.prenet_k2
        lstm1, lstm2 = self.lstm1, self.lstm2

        if use_pallas:
            from viettts_tpu.ops.ar_decoder import ar_decode

            mel = ar_decode(
                g1c, g2c, keep1, keep2,
                k_fc1, k_fc2,
                w1_p, lstm1.w_h, w2_p, w2_h1, lstm2.w_h,
                self.proj_kernel, proj_bias, scale,
                interpret=jax.default_backend() == "cpu",
            )
            residual = self.postnet(mel, train=False)
            return mel + residual

        def step(carry, inp):
            prev_mel, s1, s2 = carry
            g1c_t, g2c_t, kp1, kp2 = inp
            # Prenet on the fed-back frame.
            p = jax.nn.relu(prev_mel @ k_fc1)
            p = jnp.where(kp1, p * scale, 0.0)
            p = jax.nn.relu(p @ k_fc2)
            p = jnp.where(kp2, p * scale, 0.0)

            h1, ns1 = _gates_step(lstm1, g1c_t + p @ w1_p, s1)
            g2_t = g2c_t + p @ w2_p + h1 @ w2_h1
            h2, ns2 = _gates_step(lstm2, g2_t, s2)
            mel = h1 @ wp1 + h2 @ wp2 + proj_bias
            return (mel, ns1, ns2), mel

        init = (
            jnp.zeros((B, cfg.mel_dim), jnp.float32),
            zero_state(B, H, jnp.float32),
            zero_state(B, H, jnp.float32),
        )
        xs = (
            jnp.swapaxes(g1c, 0, 1),
            jnp.swapaxes(g2c, 0, 1),
            keep1,
            keep2,
        )
        _, mels = jax.lax.scan(step, init, xs)  # [L, B, D]
        mel = jnp.swapaxes(mels, 0, 1)  # [B, L, D]
        residual = self.postnet(mel, train=False)
        return mel + residual
