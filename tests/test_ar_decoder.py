"""Fused Pallas AR decoder: exactness vs the lax.scan decode path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viettts_tpu.config import AcousticModelConfig
from viettts_tpu.models import AcousticModel
from viettts_tpu.types import AcousticBatch


@pytest.mark.parametrize("dropout_on,B", [(True, 2), (False, 2), (False, 1)])
def test_ar_decode_matches_scan(dropout_on, B):
    """B=1 is the latency-serving shape the merged-gate kernel optimizes;
    B=2 exercises batch broadcasting of the merged dots."""
    cfg = AcousticModelConfig(
        encoder_dim=16,
        decoder_dim=32,
        prenet_dim=8,
        postnet_dim=8,
        prenet_dropout_at_inference=dropout_on,
    )
    model = AcousticModel(cfg)
    T, NF = 12, 64  # NF must be a CHUNK multiple
    rng = np.random.RandomState(0)
    toks = jnp.asarray(rng.randint(0, 93, (B, T)), jnp.int32)
    lengths = jnp.asarray([T, T - 3][:B], jnp.int32)
    durs = jnp.full((B, T), NF / T, jnp.float32)
    batch = AcousticBatch(
        toks, lengths, durs, None, None, jnp.zeros((B, NF, 80))
    )
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

    def run(use_pallas):
        return model.apply(
            params, toks, durs, NF, lengths,
            use_pallas=use_pallas,
            method=AcousticModel.inference,
            rngs={"prenet": jax.random.PRNGKey(7)},
        )

    ref = np.asarray(run(False))
    got = np.asarray(run(True))
    assert ref.shape == got.shape == (B, NF, 80)
    np.testing.assert_allclose(got, ref, atol=5e-5)
