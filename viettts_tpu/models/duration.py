"""Phoneme duration model.

Parity with the reference ``DurationModel``
(/root/reference/vietTTS/nat/model.py:50-70): TokenEncoder ->
Linear(lstm_dim) -> gelu -> Linear(1) -> softplus, predicting per-phoneme
duration in seconds.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from viettts_tpu.config import DurationModelConfig
from viettts_tpu.models.encoder import TokenEncoder
from viettts_tpu.types import DurationBatch


class DurationModel(nn.Module):
    cfg: DurationModelConfig

    @nn.compact
    def __call__(self, batch: DurationBatch, *, train: bool) -> jax.Array:
        x = TokenEncoder(
            vocab_size=self.cfg.vocab_size,
            lstm_dim=self.cfg.lstm_dim,
            dropout_rate=self.cfg.dropout_rate,
            name="encoder",
        )(batch.phonemes, batch.lengths, train=train)
        x = nn.Dense(self.cfg.lstm_dim, name="proj_0")(x)
        x = jax.nn.gelu(x)
        x = nn.Dense(1, name="proj_1")(x)
        return jax.nn.softplus(jnp.squeeze(x, axis=-1))
