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


@pytest.mark.parametrize(
    "B,L_in,C_in,C,u,k",
    [
        (1, 64, 256, 128, 8, 16),  # stage 1 shape family (F=8)
        (1, 256, 128, 64, 2, 4),   # stage 2 (F=1)
        (2, 512, 64, 32, 2, 4),    # stage 3 (F=1, g_in=2)
    ],
)
def test_fused_mrf_with_upsample_exact(B, L_in, C_in, C, u, k):
    """leaky_relu + ConvTranspose(SAME) + MRF fused in one kernel matches
    lax.conv_transpose + the XLA MRF formulation exactly."""
    rng = np.random.RandomState(1)
    kernel_sizes = (3, 7)
    dilations = ((1, 3, 5), (1, 3, 5))
    x = jnp.asarray(rng.randn(B, L_in, C_in).astype(np.float32))
    w_t = jnp.asarray(rng.randn(k, C_in, C).astype(np.float32) * 0.05)
    b_t = jnp.asarray(rng.randn(C).astype(np.float32) * 0.05)
    weights = []
    for kk in kernel_sizes:
        weights.append(
            (
                jnp.asarray(rng.randn(3, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(3, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(3, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(3, C).astype(np.float32) * 0.05),
            )
        )

    up = (
        lax.conv_transpose(
            jnp.where(x > 0, x, 0.1 * x), w_t, strides=(u,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        + b_t
    )
    ref = _ref_stack(up, weights, kernel_sizes, dilations)
    got = fused_mrf(
        x, weights, kernel_sizes, dilations,
        upsample=(w_t, b_t, u), interpret=True,
    )
    assert got.shape == ref.shape == (B, L_in * u, C)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5 * max(scale, 1.0)
    )


def test_fused_generator_with_upsample_matches_flax():
    """End-to-end fused generator (now with convT folded into the kernels)
    still matches the flax Generator."""
    cfg = HifiGanConfig(
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=256,  # stages: 128, 64, 32, 16ch
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),),
    )
    gen = Generator(cfg)
    mel = jnp.asarray(
        np.random.RandomState(2).randn(1, 8, 80).astype(np.float32)
    )
    variables = gen.init(jax.random.PRNGKey(0), mel)
    ref = gen.apply(variables, mel)
    got = generator_apply_fused(cfg, variables["params"], mel, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5
    )


def test_fused_mrf_with_post_epilogue_exact():
    """MRF + fused generator tail (lrelu 0.01 -> conv_post -> tanh) matches
    the XLA formulation."""
    rng = np.random.RandomState(3)
    B, L, C = 1, 512, 32
    kernel_sizes = (3, 7)
    dilations = ((1, 3, 5), (1, 3, 5))
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32))
    weights = []
    for kk in kernel_sizes:
        weights.append(
            (
                jnp.asarray(rng.randn(3, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(3, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(3, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(3, C).astype(np.float32) * 0.05),
            )
        )
    w_p = jnp.asarray(rng.randn(7, C, 1).astype(np.float32) * 0.1)
    b_p = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)

    mid = _ref_stack(x, weights, kernel_sizes, dilations)
    z = jax.nn.leaky_relu(mid)  # torch-default 0.01 slope
    ref = jnp.tanh(
        lax.conv_general_dilated(
            z, w_p, (1,), ((3, 3),), dimension_numbers=("NWC", "WIO", "NWC")
        )
        + b_p
    )
    got = fused_mrf(
        x, weights, kernel_sizes, dilations, post=(w_p, b_p), interpret=True
    )
    assert got.shape == (B, L, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_generator_batch_routing_matches_flax():
    """At batch >= 8 the C=128 stage routes to XLA (measured faster there);
    the output must stay identical to the flax Generator."""
    cfg = HifiGanConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=256,  # stages: 128, 64 channels
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    gen = Generator(cfg)
    mel = jnp.asarray(
        np.random.RandomState(4).randn(8, 16, 80).astype(np.float32)
    )
    variables = gen.init(jax.random.PRNGKey(0), mel)
    ref = gen.apply(variables, mel)
    got = generator_apply_fused(cfg, variables["params"], mel, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_generator_batch_chunking_exact():
    """lax.map sub-batch chunking (HBM cap at large batch) is exact vs the
    unchunked fused path and preserves row order."""
    cfg = HifiGanConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=128,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    gen = Generator(cfg)
    mel = jnp.asarray(
        np.random.RandomState(1).randn(4, 16, 80).astype(np.float32)
    )
    variables = gen.init(jax.random.PRNGKey(0), mel[:1])
    whole = generator_apply_fused(
        cfg, variables["params"], mel, interpret=True, max_chunk_batch=4,
        fuse_upsample=True,
    )
    chunked = generator_apply_fused(
        cfg, variables["params"], mel, interpret=True, max_chunk_batch=2,
        fuse_upsample=True,
    )
    assert chunked.shape == whole.shape
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(whole), atol=1e-6
    )
    # odd batch: falls back to the largest divisor (1 here) and still works
    odd = generator_apply_fused(
        cfg, variables["params"], mel[:3], interpret=True, max_chunk_batch=2,
        fuse_upsample=True,
    )
    np.testing.assert_allclose(
        np.asarray(odd), np.asarray(whole[:3]), atol=1e-6
    )
    # the auto route (ConvT unfused at this batch) is numerically identical
    auto = generator_apply_fused(
        cfg, variables["params"], mel, interpret=True, fuse_upsample=False
    )
    np.testing.assert_allclose(
        np.asarray(auto), np.asarray(whole), atol=2e-5
    )


def test_fused_mrf_resblock2_exact():
    """ResBlock2 (one conv per dilation, w2=None) through the fused kernel
    matches the XLA formulation (reference hifigan/model.py:54-74)."""
    rng = np.random.RandomState(5)
    B, L, C = 1, 512, 64
    kernel_sizes = (3, 11)
    dilations = ((1, 3), (2, 6))
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32))
    weights = []
    for kk in kernel_sizes:
        weights.append(
            (
                jnp.asarray(rng.randn(2, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(2, C).astype(np.float32) * 0.05),
                None,
                None,
            )
        )

    def lrelu(v):
        return jnp.where(v > 0, v, 0.1 * v)

    acc = None
    for blk, kk in enumerate(kernel_sizes):
        w1, b1, _, _ = weights[blk]
        r = x
        for j, d in enumerate(dilations[blk]):
            p = (kk * d - d) // 2
            y = lax.conv_general_dilated(
                lrelu(r), w1[j], (1,), ((p, p),), rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + b1[j]
            r = y + r
        acc = r if acc is None else acc + r
    ref = acc / len(kernel_sizes)

    got = fused_mrf(x, weights, kernel_sizes, dilations, interpret=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5 * max(scale, 1.0)
    )


def test_fused_generator_resblock2_matches_flax():
    """A resblock='2' (V3-style) config synthesizes through the default
    fused serving path and matches the flax Generator."""
    cfg = HifiGanConfig(
        resblock="2",
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=256,  # stages: 128, 64 channels
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (2, 6)),
    )
    gen = Generator(cfg)
    mel = jnp.asarray(
        np.random.RandomState(6).randn(2, 16, 80).astype(np.float32)
    )
    variables = gen.init(jax.random.PRNGKey(0), mel)
    ref = gen.apply(variables, mel)
    got = generator_apply_fused(cfg, variables["params"], mel, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_mrf_bf16_storage_close():
    """compute_dtype=bf16 selects bf16 storage for weights + activation
    I/O; the result stays within bf16 rounding of the f32 kernel."""
    rng = np.random.RandomState(7)
    B, L, C = 1, 512, 64
    kernel_sizes = (3, 7)
    dilations = ((1, 3), (1, 3))
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32))
    weights = []
    for kk in kernel_sizes:
        weights.append(
            (
                jnp.asarray(rng.randn(2, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(2, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(2, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(2, C).astype(np.float32) * 0.05),
            )
        )
    ref = fused_mrf(x, weights, kernel_sizes, dilations, interpret=True)
    got = fused_mrf(
        x, weights, kernel_sizes, dilations, interpret=True,
        compute_dtype=jnp.bfloat16,
    )
    assert got.dtype == jnp.bfloat16
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref),
        atol=0.02 * max(scale, 1.0),
    )


def test_fused_generator_bf16_close_to_f32():
    """The bf16-storage fused generator stays within mixed-precision
    tolerance of the f32 route end to end."""
    cfg = HifiGanConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    gen = Generator(cfg)
    mel = jnp.asarray(
        np.random.RandomState(8).randn(2, 16, 80).astype(np.float32)
    )
    variables = gen.init(jax.random.PRNGKey(0), mel)
    ref = generator_apply_fused(cfg, variables["params"], mel, interpret=True)
    got = generator_apply_fused(
        cfg, variables["params"], mel, interpret=True,
        compute_dtype=jnp.bfloat16, fused_max_batch=None,
    )
    assert got.dtype == jnp.float32  # waveform is always f32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.02)


def test_fused_mrf_int8_close_to_f32():
    """quantize_int8 runs the MRF convs as int8 x int8 -> int32 MXU passes
    with per-output-channel weight scales and dynamic per-tile activation
    scales; the result stays within int8 quantization tolerance of f32."""
    rng = np.random.RandomState(9)
    B, L, C = 2, 512, 64
    kernel_sizes = (3, 7)
    dilations = ((1, 3), (1, 3))
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32) * 0.5)
    weights = []
    for kk in kernel_sizes:
        weights.append(
            (
                jnp.asarray(rng.randn(2, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(2, C).astype(np.float32) * 0.01),
                jnp.asarray(rng.randn(2, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(2, C).astype(np.float32) * 0.01),
            )
        )
    ref = fused_mrf(x, weights, kernel_sizes, dilations, interpret=True)
    got = fused_mrf(
        x, weights, kernel_sizes, dilations, interpret=True,
        quantize_int8=True,
    )
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    rms = float(np.sqrt((ref ** 2).mean()))
    err = float(np.sqrt(((got - ref) ** 2).mean()))
    assert err / rms < 0.03, (err, rms)


def test_fused_generator_int8_close_to_f32():
    """End-to-end int8-quantized fused generator (ConvT fusion + post
    epilogue + quantized MRFs) stays within quantization tolerance of the
    f32 route, and the waveform output stays f32."""
    cfg = HifiGanConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    gen = Generator(cfg)
    mel = jnp.asarray(
        np.random.RandomState(10).randn(2, 16, 80).astype(np.float32)
    )
    variables = gen.init(jax.random.PRNGKey(0), mel)
    ref = generator_apply_fused(cfg, variables["params"], mel, interpret=True)
    got = generator_apply_fused(
        cfg, variables["params"], mel, interpret=True,
        compute_dtype=jnp.bfloat16, quantize_int8=True,
    )
    assert got.dtype == jnp.float32
    ref = np.asarray(ref)
    got = np.asarray(got)
    rms = float(np.sqrt((ref ** 2).mean()))
    err = float(np.sqrt(((got - ref) ** 2).mean()))
    assert err / max(rms, 1e-6) < 0.05, (err, rms)


def test_fused_mrf_int8_static_scales():
    """Static calibrated activation scales match the dynamic-quant route
    when calibrated on the same input, and degrade gracefully (clip, no
    blowup) when the input exceeds the calibrated range."""
    rng = np.random.RandomState(11)
    B, L, C = 2, 512, 64
    kernel_sizes = (3, 7)
    dilations = ((1, 3), (1, 3))
    x = jnp.asarray(rng.randn(B, L, C).astype(np.float32) * 0.5)
    weights = []
    for kk in kernel_sizes:
        weights.append(
            (
                jnp.asarray(rng.randn(2, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(2, C).astype(np.float32) * 0.01),
                jnp.asarray(rng.randn(2, kk, C, C).astype(np.float32) * 0.05),
                jnp.asarray(rng.randn(2, C).astype(np.float32) * 0.01),
            )
        )
    ref = np.asarray(
        fused_mrf(x, weights, kernel_sizes, dilations, interpret=True),
        np.float32,
    )

    # Calibrate per-conv amaxes with the same conv math/order (an inline
    # mirror of generator_calibrate_int8's inner loop, square convs only).
    def conv(z, w, b, d):
        p = (w.shape[0] - 1) // 2 * d
        return jax.lax.conv_general_dilated(
            z, w, (1,), ((p, p),), rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b

    amaxes = []
    acc = None
    for (w1, b1, w2, b2), kk, dils in zip(weights, kernel_sizes, dilations):
        r = x
        for di, d in enumerate(dils):
            y = jax.nn.leaky_relu(r, 0.1)
            amaxes.append(jnp.max(jnp.abs(y)))
            y = conv(y, w1[di], b1[di], d)
            y = jax.nn.leaky_relu(y, 0.1)
            amaxes.append(jnp.max(jnp.abs(y)))
            y = conv(y, w2[di], b2[di], 1)
            r = y + r
        acc = r if acc is None else acc + r
    act = jnp.stack(amaxes)

    got = np.asarray(
        fused_mrf(
            x, weights, kernel_sizes, dilations, interpret=True,
            quantize_int8=True, act_scales=act,
        ),
        np.float32,
    )
    rms = float(np.sqrt((ref ** 2).mean()))
    err = float(np.sqrt(((got - ref) ** 2).mean()))
    assert err / rms < 0.03, (err, rms)

    # 4x out-of-calibration input: clipped, bounded error, no NaN/blowup.
    x4 = x * 4.0
    ref4 = np.asarray(
        fused_mrf(x4, weights, kernel_sizes, dilations, interpret=True),
        np.float32,
    )
    got4 = np.asarray(
        fused_mrf(
            x4, weights, kernel_sizes, dilations, interpret=True,
            quantize_int8=True, act_scales=act,
        ),
        np.float32,
    )
    assert np.isfinite(got4).all()
    rms4 = float(np.sqrt((ref4 ** 2).mean()))
    err4 = float(np.sqrt(((got4 - ref4) ** 2).mean()))
    assert err4 / rms4 < 0.5, (err4, rms4)


def test_generator_int8_static_calibration():
    """generator_calibrate_int8's flat conv order matches the fused
    kernel's quantization order: calibrated static scales reproduce the
    f32 generator within quantization tolerance end to end."""
    from viettts_tpu.models.hifigan import generator_calibrate_int8

    cfg = HifiGanConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    gen = Generator(cfg)
    mel = jnp.asarray(
        np.random.RandomState(12).randn(2, 16, 80).astype(np.float32)
    )
    variables = gen.init(jax.random.PRNGKey(0), mel)
    scales = generator_calibrate_int8(cfg, variables["params"], mel)
    assert set(scales) == {0, 1}
    ref = generator_apply_fused(cfg, variables["params"], mel, interpret=True)
    got = generator_apply_fused(
        cfg, variables["params"], mel, interpret=True,
        compute_dtype=jnp.bfloat16, quantize_int8=True, act_scales=scales,
    )
    ref = np.asarray(ref)
    got = np.asarray(got)
    rms = float(np.sqrt((ref ** 2).mean()))
    err = float(np.sqrt(((got - ref) ** 2).mean()))
    assert err / max(rms, 1e-6) < 0.05, (err, rms)


def test_fused_mrf_int8_wide_channels():
    """The g=1 wide-channel path (C=256, C_in=512 ConvT fusion — the
    production stage-0 shape class) under int8 quantization with static
    scales stays within quantization tolerance of f32."""
    rng = np.random.RandomState(13)
    B, L_in, C_in, C, u = 1, 128, 512, 256, 8
    kernel_sizes = (3,)
    dilations = ((1, 3),)
    x = jnp.asarray(rng.randn(B, L_in, C_in).astype(np.float32) * 0.5)
    w_t = jnp.asarray(rng.randn(16, C_in, C).astype(np.float32) * 0.02)
    b_t = jnp.asarray(rng.randn(C).astype(np.float32) * 0.01)
    weights = [
        (
            jnp.asarray(rng.randn(2, 3, C, C).astype(np.float32) * 0.02),
            jnp.asarray(rng.randn(2, C).astype(np.float32) * 0.01),
            jnp.asarray(rng.randn(2, 3, C, C).astype(np.float32) * 0.02),
            jnp.asarray(rng.randn(2, C).astype(np.float32) * 0.01),
        )
    ]
    kw = dict(upsample=(w_t, b_t, u), interpret=True)
    ref = np.asarray(
        fused_mrf(x, weights, kernel_sizes, dilations, **kw), np.float32
    )
    got_dyn = np.asarray(
        fused_mrf(
            x, weights, kernel_sizes, dilations, quantize_int8=True, **kw
        ),
        np.float32,
    )
    # static scales: calibrate per-conv amaxes with the same conv math
    def conv(z, w, b, d):
        p = (w.shape[0] - 1) // 2 * d
        return jax.lax.conv_general_dilated(
            z, w, (1,), ((p, p),), rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b

    xin = jax.nn.leaky_relu(x, 0.1)
    xu = jax.lax.conv_transpose(
        xin, w_t, strides=(u,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b_t
    amaxes = []
    (w1, b1, w2, b2), = weights
    r = xu
    for di, d in enumerate(dilations[0]):
        y = jax.nn.leaky_relu(r, 0.1)
        amaxes.append(jnp.max(jnp.abs(y)))
        y = conv(y, w1[di], b1[di], d)
        y = jax.nn.leaky_relu(y, 0.1)
        amaxes.append(jnp.max(jnp.abs(y)))
        y = conv(y, w2[di], b2[di], 1)
        r = y + r
    got_st = np.asarray(
        fused_mrf(
            x, weights, kernel_sizes, dilations, quantize_int8=True,
            act_scales=jnp.stack(amaxes), **kw
        ),
        np.float32,
    )
    rms = float(np.sqrt((ref ** 2).mean()))
    for got in (got_dyn, got_st):
        err = float(np.sqrt(((got - ref) ** 2).mean()))
        assert err / rms < 0.03, (err, rms)
