"""Fused Pallas MRF kernel: exactness vs the XLA conv formulation
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from viettts_tpu.config import HifiGanConfig
from viettts_tpu.models import Generator
from viettts_tpu.models.hifigan import generator_apply_fused
from viettts_tpu.ops.mrf import fused_mrf


def _ref_stack(x, weights, kernel_sizes, dilations):
    def ref_conv(x, w, b, k, d):
        p = (k * d - d) // 2
        y = lax.conv_general_dilated(
            x, w, (1,), ((p, p),), rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + b

    def lrelu(v):
        return jnp.where(v > 0, v, 0.1 * v)

    acc = None
    for blk, k in enumerate(kernel_sizes):
        w1, b1, w2, b2 = weights[blk]
        r = x
        for j, d in enumerate(dilations[blk]):
            y = ref_conv(lrelu(r), w1[j], b1[j], k, d)
            y = ref_conv(lrelu(y), w2[j], b2[j], k, 1)
            r = y + r
        acc = r if acc is None else acc + r
    return acc / len(kernel_sizes)


@pytest.mark.parametrize(
    "B,L,C",
    [(1, 512, 32), (2, 1024, 64), (1, 512, 128), (1, 256, 256)],
)
def test_fused_mrf_exact(B, L, C):
    rng = np.random.RandomState(0)
    kernel_sizes = (3, 7, 11)
    dilations = ((1, 3, 5),) * 3
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32))
    weights = []
    for k in kernel_sizes:
        weights.append(
            (
                jnp.asarray(rng.randn(3, k, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(3, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(3, k, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(3, C).astype(np.float32) * 0.05),
            )
        )
    ref = _ref_stack(x, weights, kernel_sizes, dilations)
    got = fused_mrf(x, weights, kernel_sizes, dilations, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5 * max(scale, 1.0)
    )


def test_fused_generator_matches_flax():
    cfg = HifiGanConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=128,  # stages: 64, 32 channels
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    gen = Generator(cfg)
    mel = jnp.asarray(
        np.random.RandomState(0).randn(1, 32, 80).astype(np.float32)
    )
    variables = gen.init(jax.random.PRNGKey(0), mel)
    ref = gen.apply(variables, mel)
    got = generator_apply_fused(cfg, variables["params"], mel, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
