"""LSTM op tests: numerical parity with haiku's LSTM / ResetCore, which is
the contract that makes reference checkpoints loadable."""

import numpy as np
import pytest

import haiku as hk
import jax
import jax.numpy as jnp

from viettts_tpu.ops.rnn import (
    LSTMParams,
    bidirectional_lstm,
    init_lstm,
    lstm_cell,
    unroll_lstm,
    zero_state,
)

B, L, D, H = 3, 7, 5, 4


def _random_params(seed=0):
    rng = np.random.RandomState(seed)
    w = rng.randn(D + H, 4 * H).astype(np.float32) * 0.3
    b = rng.randn(4 * H).astype(np.float32) * 0.1
    return LSTMParams(
        w_i=jnp.asarray(w[:D]), w_h=jnp.asarray(w[D:]), b=jnp.asarray(b)
    ), w, b


def _hk_lstm_apply(w, b, xs, reverse=False, reset_mask=None):
    """Run hk.LSTM (optionally wrapped in ResetCore on a flipped sequence)
    with explicit weights."""

    def fn(x, mask):
        core = hk.LSTM(H)
        state = core.initial_state(x.shape[0])
        if mask is None:
            out, _ = hk.dynamic_unroll(core, x, state, time_major=False)
            return out
        core = hk.ResetCore(core)
        out, _ = hk.dynamic_unroll(core, (x, mask), state, time_major=False)
        return out

    transformed = hk.transform(fn)
    params = {"lstm/linear": {"w": jnp.asarray(w), "b": jnp.asarray(b)}}
    return transformed.apply(params, None, xs, reset_mask)


def test_lstm_cell_matches_haiku():
    params, w, b = _random_params()
    rng = np.random.RandomState(1)
    xs = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    ours, _ = unroll_lstm(params, xs)
    theirs = _hk_lstm_apply(w, b, xs)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-5)


def test_lstm_reverse_equals_flip():
    params, w, b = _random_params(2)
    rng = np.random.RandomState(3)
    xs = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    rev, _ = unroll_lstm(params, xs, reverse=True)
    flipped, _ = unroll_lstm(params, jnp.flip(xs, axis=1))
    np.testing.assert_allclose(
        np.asarray(rev), np.asarray(jnp.flip(flipped, axis=1)), atol=1e-5
    )


def test_reset_mask_matches_haiku_reset_core():
    params, w, b = _random_params(4)
    rng = np.random.RandomState(5)
    xs = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    lengths = jnp.asarray([L, L - 2, 3], jnp.int32)
    mask = jnp.arange(L)[None, :] >= (lengths[:, None] - 1)

    # Reference construction: flip input+mask, run ResetCore, flip back.
    xs_f = jnp.flip(xs, axis=1)
    mask_f = jnp.flip(mask, axis=1)
    theirs = jnp.flip(_hk_lstm_apply(w, b, xs_f, reset_mask=mask_f), axis=1)

    ours, _ = unroll_lstm(params, xs, reverse=True, reset_mask=mask)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-5)


def test_bidirectional_shapes():
    fwd = init_lstm(jax.random.PRNGKey(0), D, H)
    bwd = init_lstm(jax.random.PRNGKey(1), D, H)
    rng = np.random.RandomState(6)
    xs = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    lengths = jnp.asarray([L, 4, 2], jnp.int32)
    out = bidirectional_lstm(fwd, bwd, xs, lengths)
    assert out.shape == (B, L, 2 * H)


def test_backward_context_isolated_from_padding():
    """Positions within a sequence must not see padding through the backward
    LSTM: same real tokens, different padding -> same backward outputs."""
    fwd = init_lstm(jax.random.PRNGKey(0), D, H)
    bwd = init_lstm(jax.random.PRNGKey(1), D, H)
    rng = np.random.RandomState(7)
    real = rng.randn(1, 4, D).astype(np.float32)
    pad_a = np.zeros((1, 3, D), np.float32)
    pad_b = rng.randn(1, 3, D).astype(np.float32) * 10
    xs_a = jnp.asarray(np.concatenate([real, pad_a], axis=1))
    xs_b = jnp.asarray(np.concatenate([real, pad_b], axis=1))
    lengths = jnp.asarray([4], jnp.int32)
    out_a = bidirectional_lstm(fwd, bwd, xs_a, lengths)
    out_b = bidirectional_lstm(fwd, bwd, xs_b, lengths)
    np.testing.assert_allclose(
        np.asarray(out_a[:, :4]), np.asarray(out_b[:, :4]), atol=1e-5
    )


def test_single_step_cell():
    params, w, b = _random_params(8)
    x = jnp.ones((B, D))
    h, state = lstm_cell(params, x, zero_state(B, H))
    assert h.shape == (B, H)
    np.testing.assert_allclose(np.asarray(h), np.asarray(state.h))
