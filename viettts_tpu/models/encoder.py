"""Shared phoneme/text encoder.

Architecture parity with the reference ``TokenEncoder``
(/root/reference/vietTTS/nat/model.py:9-47): embedding -> 3 x [Conv1D(k=3,
SAME) + BatchNorm(0.9) + relu + dropout] -> bidirectional LSTM with
end-of-sequence reset on the backward direction.  Implemented as a flax
module over the pure LSTM ops in :mod:`viettts_tpu.ops.rnn` (input
projections hoisted out of the scan), instead of haiku's implicit-state
``dynamic_unroll``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from viettts_tpu.ops.rnn import LSTMParams, bidirectional_lstm


def lstm_param_init(input_dim: int, hidden_dim: int):
    """Flax initializer producing hk.Linear-style LSTM params."""

    def init(key, _shape=None, dtype=jnp.float32):
        stddev = 1.0 / jnp.sqrt(jnp.asarray(input_dim + hidden_dim, dtype))
        w = stddev * jax.random.truncated_normal(
            key, -2.0, 2.0, (input_dim + hidden_dim, 4 * hidden_dim), dtype
        )
        return LSTMParams(
            w_i=w[:input_dim],
            w_h=w[input_dim:],
            b=jnp.zeros((4 * hidden_dim,), dtype),
        )

    return init


class TokenEncoder(nn.Module):
    """Embed + conv stack + bi-LSTM.  Output dim = 2 * lstm_dim."""

    vocab_size: int
    lstm_dim: int
    dropout_rate: float

    @nn.compact
    def __call__(
        self, phonemes: jax.Array, lengths: jax.Array, *, train: bool
    ) -> jax.Array:
        x = nn.Embed(self.vocab_size, self.lstm_dim, name="embed")(phonemes)
        for i in range(3):
            x = nn.Conv(
                self.lstm_dim, (3,), padding="SAME", name=f"conv_{i}"
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn_{i}",
            )(x)
            x = jax.nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        fwd = self.param(
            "lstm_fwd", lstm_param_init(self.lstm_dim, self.lstm_dim)
        )
        bwd = self.param(
            "lstm_bwd", lstm_param_init(self.lstm_dim, self.lstm_dim)
        )
        return bidirectional_lstm(fwd, bwd, x, lengths)
