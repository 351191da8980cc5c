"""HiFi-GAN vocoder: generator, discriminators and GAN losses in JAX.

Generator architecture parity with the reference Haiku port
(/root/reference/vietTTS/hifigan/model.py:13-125) and the upstream config
(assets/hifigan/config.json): Conv(512, k=7) pre -> 4 stages of
[leaky_relu -> ConvTranspose(k in {16,16,4,4}, stride in {8,8,2,2}, SAME) ->
mean of 3 multi-receptive-field ResBlocks] -> leaky_relu -> Conv(1, k=7) ->
tanh.  Total upsampling x256 = one hop of audio per mel frame.

The discriminators (multi-period + multi-scale) and the GAN losses are
first-party here — the reference delegates vocoder GAN training to the
upstream PyTorch repo (torch_model.py:221-414 exists only for weight
conversion).  Weight normalization is implemented as an explicit
reparameterization (w = g * v / ||v||) so trained generators can be folded
into plain-conv checkpoints for inference.

Everything runs in NWC layout, the natural layout for XLA:TPU convolutions.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viettts_tpu.config import HifiGanConfig

LRELU_SLOPE = 0.1


def _same_pad(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class WNConv(nn.Module):
    """1D convolution with optional weight normalization.

    With ``use_wn=True`` the kernel is parameterized as
    ``g * v / ||v||_{(in, k)}`` (norm over all axes except the output
    channel), matching torch's ``weight_norm(Conv1d)``.  ``fold_weight_norm``
    converts trained params to a plain kernel.
    """

    features: int
    kernel_size: int
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    use_wn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k_shape = (self.kernel_size, in_ch // self.groups, self.features)
        kernel_init = nn.initializers.normal(0.01)
        if self.use_wn:
            v = self.param("v", kernel_init, k_shape)
            g = self.param(
                "g",
                lambda key, shape: jnp.linalg.norm(
                    kernel_init(key, k_shape).reshape(-1, self.features), axis=0
                ),
                (self.features,),
            )
            norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
            kernel = v * (g / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", kernel_init, k_shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        p = _same_pad(self.kernel_size, self.dilation)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.strides,),
            padding=((p, p),),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
            preferred_element_type=self.dtype,
        )
        return y + bias.astype(self.dtype)


class ResBlock1(nn.Module):
    """3 x (lrelu -> dilated conv -> lrelu -> conv -> +residual)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    use_wn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = WNConv(
                self.channels,
                self.kernel_size,
                dilation=d,
                use_wn=self.use_wn,
                dtype=self.dtype,
                name=f"convs1_{i}",
            )(xt)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = WNConv(
                self.channels,
                self.kernel_size,
                dilation=1,
                use_wn=self.use_wn,
                dtype=self.dtype,
                name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """2 x (lrelu -> dilated conv -> +residual)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)
    use_wn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = WNConv(
                self.channels,
                self.kernel_size,
                dilation=d,
                use_wn=self.use_wn,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """Mel [B, T, n_mels] -> waveform [B, T * 256, 1] in [-1, 1]."""

    cfg: HifiGanConfig
    use_wn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        num_kernels = len(cfg.resblock_kernel_sizes)
        res_cls = ResBlock1 if cfg.resblock == "1" else ResBlock2

        x = x.astype(self.dtype)
        x = WNConv(
            cfg.upsample_initial_channel, 7, use_wn=self.use_wn,
            dtype=self.dtype, name="conv_pre",
        )(x)
        for i, (u, k) in enumerate(
            zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
        ):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = UpsampleConv(
                ch, k, u, use_wn=self.use_wn, dtype=self.dtype,
                name=f"ups_{i}",
            )(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                y = res_cls(
                    ch,
                    rk,
                    rd,
                    use_wn=self.use_wn,
                    dtype=self.dtype,
                    name=f"resblock_{i * num_kernels + j}",
                )(x)
                acc = y if acc is None else acc + y
            x = acc / num_kernels
        x = jax.nn.leaky_relu(x)  # default slope, matching upstream
        x = WNConv(
            1, 7, use_wn=self.use_wn, dtype=self.dtype, name="conv_post"
        )(x)
        return jnp.tanh(x.astype(jnp.float32))


class UpsampleConv(nn.Module):
    """Strided transposed 1D convolution with SAME padding.

    Equivalent to ``hk.Conv1DTranspose(padding="SAME")`` as used by the
    reference generator (hifigan/model.py:86-95); kernel layout here is
    (W, I, O).
    """

    features: int
    kernel_size: int
    stride: int
    use_wn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k_shape = (self.kernel_size, in_ch, self.features)
        kernel_init = nn.initializers.normal(0.01)
        if self.use_wn:
            v = self.param("v", kernel_init, k_shape)
            g = self.param(
                "g",
                lambda key, shape: jnp.linalg.norm(
                    kernel_init(key, k_shape).reshape(-1, self.features), axis=0
                ),
                (self.features,),
            )
            norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
            kernel = v * (g / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", kernel_init, k_shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_transpose(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=(self.stride,),
            padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=self.dtype,
        )
        return y + bias.astype(self.dtype)


# ---------------------------------------------------------------------------
# Discriminators (first-party; reference delegates these to upstream torch,
# torch_model.py:221-380).
# ---------------------------------------------------------------------------


class PeriodDiscriminator(nn.Module):
    """Reshapes the waveform into [T/p, p] and applies (k, 1) 2D convs.

    ``base_channels=32`` reproduces the upstream channel ladder
    (32, 128, 512, 1024, 1024); smaller values scale every layer down.
    """

    period: int
    kernel_size: int = 5
    stride: int = 3
    base_channels: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, List[jax.Array]]:
        # x: [B, T, 1]
        B, T, C = x.shape
        p = self.period
        if T % p != 0:
            n_pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // p, p, C)

        fmap = []
        bc = self.base_channels
        channels = (bc, 4 * bc, 16 * bc, 32 * bc)
        pad = _same_pad(self.kernel_size)
        for i, ch in enumerate(channels):
            x = ConvWN2D(
                ch, (self.kernel_size, 1), (self.stride, 1), ((pad, pad), (0, 0)),
                name=f"conv_{i}",
            )(x)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = ConvWN2D(
            32 * bc, (self.kernel_size, 1), (1, 1), ((2, 2), (0, 0)),
            name="conv_4",
        )(x)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = ConvWN2D(1, (3, 1), (1, 1), ((1, 1), (0, 0)), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class ConvWN2D(nn.Module):
    """2D convolution with weight normalization (NHWC)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k_shape = self.kernel_size + (in_ch, self.features)
        kernel_init = nn.initializers.normal(0.01)
        v = self.param("v", kernel_init, k_shape)
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                kernel_init(key, k_shape).reshape(-1, self.features), axis=0
            ),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        kernel = v * (g / jnp.maximum(norm, 1e-12))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    base_channels: int = 32

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        real_outs, gen_outs, real_fmaps, gen_fmaps = [], [], [], []
        for p in self.periods:
            d = PeriodDiscriminator(
                p, base_channels=self.base_channels, name=f"disc_p{p}"
            )
            out_r, fmap_r = d(y)
            out_g, fmap_g = d(y_hat)
            real_outs.append(out_r)
            gen_outs.append(out_g)
            real_fmaps.append(fmap_r)
            gen_fmaps.append(fmap_g)
        return real_outs, gen_outs, real_fmaps, gen_fmaps


class ScaleDiscriminator(nn.Module):
    """Stacked grouped 1D convs over the raw (possibly pooled) waveform.

    ``base_channels=128`` reproduces the upstream ladder
    (128, 128, 256, 512, 1024, 1024, 1024).  ``use_spectral_norm`` switches
    the kernels from weight norm to spectral norm — upstream uses spectral
    norm for the first (unpooled) scale discriminator
    (torch_model.py:322-326)."""

    base_channels: int = 128
    use_spectral_norm: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, update_stats: bool = False
    ) -> Tuple[jax.Array, List[jax.Array]]:
        # x: [B, T, 1]
        B = x.shape[0]
        fmap = []
        bc = self.base_channels
        conv_cls = ConvSN1DPadded if self.use_spectral_norm else ConvWN1DPadded
        kw = {"update_stats": update_stats} if self.use_spectral_norm else {}
        layer_specs = [
            # (features, kernel, stride, groups, pad)
            (bc, 15, 1, 1, 7),
            (bc, 41, 2, 4, 20),
            (2 * bc, 41, 2, 16, 20),
            (4 * bc, 41, 4, 16, 20),
            (8 * bc, 41, 4, 16, 20),
            (8 * bc, 41, 1, 16, 20),
            (8 * bc, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, grp, pad) in enumerate(layer_specs):
            x = conv_cls(ch, k, s, grp, pad, name=f"conv_{i}")(x, **kw)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = conv_cls(1, 3, 1, 1, 1, name="conv_post")(x, **kw)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class ConvWN1DPadded(nn.Module):
    """Weight-normalized 1D conv with explicit symmetric padding."""

    features: int
    kernel_size: int
    strides: int
    groups: int
    pad: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k_shape = (self.kernel_size, in_ch // self.groups, self.features)
        kernel_init = nn.initializers.normal(0.01)
        v = self.param("v", kernel_init, k_shape)
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                kernel_init(key, k_shape).reshape(-1, self.features), axis=0
            ),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        kernel = v * (g / jnp.maximum(norm, 1e-12))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.strides,),
            padding=((self.pad, self.pad),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
        )
        return y + bias


class ConvSN1DPadded(nn.Module):
    """Spectrally normalized 1D conv: kernel scaled by 1/sigma_max, with
    sigma_max estimated by one power-iteration step per training forward
    (u persisted in the 'spectral' variable collection — torch
    spectral_norm semantics, u/v treated as constants in the gradient)."""

    features: int
    kernel_size: int
    strides: int
    groups: int
    pad: int

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        k_shape = (self.kernel_size, in_ch // self.groups, self.features)
        kernel = self.param("kernel", nn.initializers.normal(0.01), k_shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        # torch flattens with the output dim first: W [O, k * I/g]
        W = kernel.reshape(-1, self.features).T
        u_var = self.variable(
            "spectral",
            "u",
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (self.features,)
            ),
        )
        u = jax.lax.stop_gradient(u_var.value)

        def normalize(v):
            return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)

        v = normalize(jax.lax.stop_gradient(W).T @ u)
        u_new = normalize(jax.lax.stop_gradient(W) @ v)
        if update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = u_new @ (W @ v)  # grad flows through W only
        kernel_sn = kernel / sigma
        y = jax.lax.conv_general_dilated(
            x,
            kernel_sn,
            window_strides=(self.strides,),
            padding=((self.pad, self.pad),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
        )
        return y + bias


def _avg_pool_1d(x: jax.Array, window: int = 4, stride: int = 2, pad: int = 2):
    """AvgPool1d(kernel=4, stride=2, padding=2) on [B, T, C], count
    includes padding (torch's count_include_pad=True default)."""
    y = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (pad, pad), (0, 0)),
    )
    return y / window


class MultiScaleDiscriminator(nn.Module):
    """Scale discriminators at x1, x2-pooled, x4-pooled... resolutions.
    The first (unpooled) scale uses spectral norm, like upstream."""

    num_scales: int = 3
    base_channels: int = 128

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array, update_stats: bool = False):
        real_outs, gen_outs, real_fmaps, gen_fmaps = [], [], [], []
        for i in range(self.num_scales):
            if i != 0:
                y = _avg_pool_1d(y)
                y_hat = _avg_pool_1d(y_hat)
            d = ScaleDiscriminator(
                base_channels=self.base_channels,
                use_spectral_norm=(i == 0),
                name=f"disc_s{i}",
            )
            out_r, fmap_r = d(y, update_stats=update_stats)
            out_g, fmap_g = d(y_hat)
            real_outs.append(out_r)
            gen_outs.append(out_g)
            real_fmaps.append(fmap_r)
            gen_fmaps.append(fmap_g)
        return real_outs, gen_outs, real_fmaps, gen_fmaps


# ---------------------------------------------------------------------------
# GAN losses (least-squares GAN + feature matching, reference
# torch_model.py:383-414).
# ---------------------------------------------------------------------------


def feature_matching_loss(fmaps_real, fmaps_gen) -> jax.Array:
    # Accumulate in f32 so the bf16 mixed-precision training path keeps
    # full-precision loss reductions (no-op casts under plain f32).
    loss = 0.0
    for fmap_r, fmap_g in zip(fmaps_real, fmaps_gen):
        for r, g in zip(fmap_r, fmap_g):
            loss = loss + jnp.mean(
                jnp.abs(r.astype(jnp.float32) - g.astype(jnp.float32))
            )
    return loss * 2.0


def discriminator_loss(real_outs, gen_outs) -> jax.Array:
    loss = 0.0
    for dr, dg in zip(real_outs, gen_outs):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        loss = loss + jnp.mean(jnp.square(1.0 - dr)) + jnp.mean(jnp.square(dg))
    return loss


def generator_adversarial_loss(gen_outs) -> jax.Array:
    loss = 0.0
    for dg in gen_outs:
        loss = loss + jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32)))
    return loss


# ---------------------------------------------------------------------------
# Fused inference path (Pallas MRF).
# ---------------------------------------------------------------------------


def generator_apply_fused(
    cfg: HifiGanConfig,
    params,
    mel: jax.Array,
    *,
    interpret: bool = False,
    max_chunk_batch: int = 16,
    fuse_upsample: bool | None = None,
    compute_dtype: Any = jnp.float32,
    fused_max_batch: int | None | str = "auto",
    quantize_int8: bool = False,
    act_scales: dict | None = None,
) -> jax.Array:
    """Generator forward with fused Pallas MRF stages; see
    ``_generator_apply_fused_one``.

    ``fuse_upsample=None`` picks the measured-best route (v5e, T=768,
    scripts/tune_vocoder_batch.py, round 3 — weight-resident kernels with
    large tiles): with bf16 storage the ConvT-fused route wins at EVERY
    batch size (B=1: 5.06 vs 8.72 ms; B=64: 280.7 vs 293.5 ms), so it is
    always on for bf16.  For f32 the pre-residency measurements stand
    (fused wins only below B=8), so f32 keeps the batch gate.

    On the ConvT-fused route the x256-stage activations are large; above
    ``max_chunk_batch`` the batch is processed in sub-batches via
    ``lax.map`` (chunk = largest divisor of B <= ``max_chunk_batch``),
    letting XLA reuse one chunk's buffers across iterations (B=64
    throughput measured flat in chunk size: 283.1/284.1/285.3 ms at
    16/32/64).

    ``compute_dtype=jnp.bfloat16`` selects bf16 *storage* for weights and
    inter-stage activations (matmul operands are rounded to bf16 by the
    MXU at jax's DEFAULT precision either way; accumulation and the final
    tanh/waveform stay f32).  ``fused_max_batch`` caps the batch routed
    to the Pallas MRF at the C>=128 stages (None = no cap; the bf16 kernel
    keeps its packed weights VMEM-resident, so the cap defaults off for
    bf16 — and for int8, where the quantized kernel wins at every measured
    batch).  Passing an explicit int gates the wide stages on EVERY route,
    int8 included (per-shape regression escape hatch).

    ``quantize_int8=True`` runs the MRF convs of every fused stage as
    int8 x int8 -> int32 MXU passes (2x the bf16 matmul rate on v5e) with
    per-output-channel weight scales and dynamic per-tile activation
    scales; residuals, the fused ConvTranspose/conv_post, and the XLA
    stages stay in ``compute_dtype``.  See ``fused_mrf(quantize_int8=)``
    for the scheme and HifiGanConfig.inference_dtype for the measured
    quality bound.

    ``act_scales`` (optional, with ``quantize_int8``): per-stage
    calibrated activation amaxes from ``generator_calibrate_int8`` —
    switches the kernels to static activation scales (no per-tile amax
    reduce; out-of-range inputs clip).
    """
    B = mel.shape[0]
    is_bf16 = jnp.dtype(compute_dtype) == jnp.bfloat16
    if fuse_upsample is None:
        fuse_upsample = True if (is_bf16 or quantize_int8) else B < 8
    if fused_max_batch == "auto":
        fused_max_batch = None if (is_bf16 or quantize_int8) else 8
    if fuse_upsample and B > max_chunk_batch:
        chunk = max(
            d for d in range(1, max_chunk_batch + 1) if B % d == 0
        )
        if chunk < B:
            mels = mel.reshape(B // chunk, chunk, *mel.shape[1:])
            waves = jax.lax.map(
                lambda m: _generator_apply_fused_one(
                    cfg, params, m, interpret=interpret,
                    fuse_upsample=fuse_upsample,
                    compute_dtype=compute_dtype,
                    fused_max_batch=fused_max_batch,
                    quantize_int8=quantize_int8,
                    act_scales=act_scales,
                ),
                mels,
            )
            return waves.reshape(B, *waves.shape[2:])
    return _generator_apply_fused_one(
        cfg, params, mel, interpret=interpret, fuse_upsample=fuse_upsample,
        compute_dtype=compute_dtype, fused_max_batch=fused_max_batch,
        quantize_int8=quantize_int8, act_scales=act_scales,
    )


def _generator_apply_fused_one(
    cfg: HifiGanConfig,
    params,
    mel: jax.Array,
    *,
    interpret: bool = False,
    fuse_upsample: bool = True,
    compute_dtype: Any = jnp.float32,
    fused_max_batch: int | None = 8,
    quantize_int8: bool = False,
    act_scales: dict | None = None,
) -> jax.Array:
    """Generator forward with each stage's MRF resblock stack fused into a
    single Pallas kernel (viettts_tpu.ops.mrf) instead of 18 separate XLA
    convs.  Numerically equivalent to ``Generator(cfg).apply({'params':
    params}, mel)`` for plain (use_wn=False) params; intended for serving.
    """
    from viettts_tpu.ops.mrf import fused_mrf, mrf_weights_from_params

    num_kernels = len(cfg.resblock_kernel_sizes)
    cd = jnp.dtype(compute_dtype)

    def conv(name, x, k, stride=1, dilation=1, sub=None):
        entry = params[name] if sub is None else params[name][sub]
        p = _same_pad(k, dilation)
        y = jax.lax.conv_general_dilated(
            x.astype(cd),
            entry["kernel"].astype(cd),
            window_strides=(stride,),
            padding=((p, p),),
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=cd,
        )
        return y + entry["bias"].astype(cd)

    def xla_mrf(x, stage):
        """Plain-conv MRF for stages too wide for the fused kernel's VMEM
        budget (XLA already handles wide channels well).  Supports both
        ResBlock1 (convs1_*/convs2_* pairs) and ResBlock2 (single convs_*
        per dilation, reference hifigan/model.py:54-74)."""
        acc = None
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            block = f"resblock_{stage * num_kernels + j}"
            r = x
            for di, d in enumerate(rd):
                y = jax.nn.leaky_relu(r, LRELU_SLOPE)
                if cfg.resblock == "1":
                    y = conv(block, y, rk, dilation=d, sub=f"convs1_{di}")
                    y = jax.nn.leaky_relu(y, LRELU_SLOPE)
                    y = conv(block, y, rk, dilation=1, sub=f"convs2_{di}")
                else:
                    y = conv(block, y, rk, dilation=d, sub=f"convs_{di}")
                r = y + r
            acc = r if acc is None else acc + r
        return acc / num_kernels

    n_stages = len(cfg.upsample_rates)
    batch = mel.shape[0]
    x = conv("conv_pre", mel, 7)
    post_done = False
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        last = i == n_stages - 1
        # Measured on v5e (scripts/profile_vocoder.py): at C=128 the fused
        # kernel wins below batch 8 (2.4 vs 5.6 ms at B=1) but XLA wins at
        # large batch (16.7 vs 17.7 ms at B=8); narrower stages always fuse.
        # ``fused_max_batch=None`` lifts the C=128 cap (weight-resident
        # kernel, re-measured via scripts/tune_vocoder_batch.py).
        # Stage 0 (C=256) stays on XLA for f32/bf16: the kernel supports
        # C % 128 == 0 (g=1, zero packing overhead), but XLA's bf16 convs
        # already run at ~92% of bf16 peak there and win the measurement
        # (scripts/profile_stage.py, B=16 T=768 bf16: XLA 9.16 ms vs
        # fused 10.04 / hybrid 10.56); at C<=128 the fused kernel wins
        # (stage 3: fused 20.3 vs XLA 53.6 ms).  Under int8 the picture
        # flips — the quantized fused kernel halves the MXU passes that
        # XLA bf16 cannot (stage 0, B=64 T=768: int8-static 24.2 ms vs
        # XLA 35.5), so every 128-divisible stage routes to the kernel.
        use_fused = (
            ch <= 128
            and (128 % ch == 0)
            and (
                ch < 128
                or fused_max_batch is None
                or batch < fused_max_batch
            )
        ) or (
            # int8: the quantized kernel halves the MXU passes XLA's bf16
            # convs cannot, so every 128-divisible stage routes to it by
            # default ("auto" resolves fused_max_batch to None).  An
            # EXPLICIT fused_max_batch still gates these stages — the
            # per-shape escape hatch if a large-batch shape regresses.
            quantize_int8
            and ch % 128 == 0
            and (fused_max_batch is None or batch < fused_max_batch)
        )
        if use_fused:
            weights = mrf_weights_from_params(params, i, num_kernels)
            # On the last stage also fuse the generator tail
            # (leaky_relu -> conv_post -> tanh) as a kernel epilogue.
            post_w = (
                (params["conv_post"]["kernel"], params["conv_post"]["bias"])
                if last
                else None
            )
            if fuse_upsample:
                try:
                    # Preferred: the ConvTranspose upsample fused into the
                    # same kernel (the pre-MRF activation never touches HBM).
                    x = fused_mrf(
                        x,
                        weights,
                        cfg.resblock_kernel_sizes,
                        cfg.resblock_dilation_sizes,
                        upsample=(
                            params[f"ups_{i}"]["kernel"],
                            params[f"ups_{i}"]["bias"],
                            u,
                        ),
                        post=post_w,
                        interpret=interpret,
                        compute_dtype=cd,
                        quantize_int8=quantize_int8,
                        act_scales=(act_scales or {}).get(i),
                    )
                    post_done = last
                    continue
                except ValueError:
                    # Shape/packing not supported (odd channel counts or
                    # tile divisibility) — fall back to XLA convT + MRF.
                    pass
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = (
            jax.lax.conv_transpose(
                x.astype(cd),
                params[f"ups_{i}"]["kernel"].astype(cd),
                strides=(u,),
                padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=cd,
            )
            + params[f"ups_{i}"]["bias"].astype(cd)
        )
        if use_fused:
            weights = mrf_weights_from_params(params, i, num_kernels)
            post_w = (
                (params["conv_post"]["kernel"], params["conv_post"]["bias"])
                if last
                else None
            )
            try:
                x = fused_mrf(
                    x,
                    weights,
                    cfg.resblock_kernel_sizes,
                    cfg.resblock_dilation_sizes,
                    post=post_w,
                    interpret=interpret,
                    compute_dtype=cd,
                    quantize_int8=quantize_int8,
                    act_scales=(act_scales or {}).get(i),
                )
                post_done = last
                continue
            except ValueError:
                try:
                    x = fused_mrf(
                        x,
                        weights,
                        cfg.resblock_kernel_sizes,
                        cfg.resblock_dilation_sizes,
                        interpret=interpret,
                        compute_dtype=cd,
                        quantize_int8=quantize_int8,
                        act_scales=(act_scales or {}).get(i),
                    )
                except ValueError:
                    # tiny/tile-misaligned shapes (e.g. debug configs):
                    # plain XLA is both correct and fast enough there
                    x = xla_mrf(x, i)
        else:
            x = xla_mrf(x, i)
    if post_done:
        return x
    x = jax.nn.leaky_relu(x)
    x = conv("conv_post", x, 7)
    return jnp.tanh(x.astype(jnp.float32))


def _mrf_activation_walk(cfg: HifiGanConfig, params, mel: jax.Array, metric):
    """Run the plain-XLA f32 generator on ``mel`` and reduce every MRF conv
    input with ``metric(stage, conv_index, activation)`` — in exactly the
    flat conv order ``fused_mrf`` quantizes in (resblocks x dilation units
    x convs per unit).  Returns ``{stage_index: [n_convs] f32}``.
    Jit-compatible.  Shared by int8 calibration and clip diagnostics."""
    num_kernels = len(cfg.resblock_kernel_sizes)

    def conv(name, x, k, dilation=1, sub=None):
        entry = params[name] if sub is None else params[name][sub]
        p = _same_pad(k, dilation)
        y = jax.lax.conv_general_dilated(
            x,
            entry["kernel"].astype(jnp.float32),
            window_strides=(1,),
            padding=((p, p),),
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        return y + entry["bias"].astype(jnp.float32)

    x = conv("conv_pre", mel.astype(jnp.float32), 7)
    out: dict = {}
    for i, u in enumerate(cfg.upsample_rates):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = (
            jax.lax.conv_transpose(
                x,
                params[f"ups_{i}"]["kernel"].astype(jnp.float32),
                strides=(u,),
                padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
            )
            + params[f"ups_{i}"]["bias"].astype(jnp.float32)
        )
        vals = []
        acc = None
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            block = f"resblock_{i * num_kernels + j}"
            r = x
            for di, d in enumerate(rd):
                y = jax.nn.leaky_relu(r, LRELU_SLOPE)
                vals.append(metric(i, len(vals), y))
                if cfg.resblock == "1":
                    y = conv(block, y, rk, dilation=d, sub=f"convs1_{di}")
                    y = jax.nn.leaky_relu(y, LRELU_SLOPE)
                    vals.append(metric(i, len(vals), y))
                    y = conv(block, y, rk, dilation=1, sub=f"convs2_{di}")
                else:
                    y = conv(block, y, rk, dilation=d, sub=f"convs_{di}")
                r = y + r
            acc = r if acc is None else acc + r
        x = acc / num_kernels
        out[i] = jnp.stack(vals)
    return out


def generator_calibrate_int8(
    cfg: HifiGanConfig, params, mel: jax.Array, margin: float = 1.0
):
    """Per-conv activation amaxes for static int8 MRF quantization.

    Records ``max|leaky_relu(conv input)| * margin`` for every MRF conv of
    every stage.  Returns ``{stage_index: [n_convs] f32}``; pass it to
    ``generator_apply_fused(act_scales=...)``.  Inputs beyond a calibrated
    range are hard-clipped by the kernel, so calibrate on several diverse
    utterances (Synthesizer.calibrate_int8 does, and tree-maxes the
    results) and keep a safety ``margin`` > 1 — the int8 resolution cost
    of a 1.25x margin is ~0.2 bit, far cheaper than silent clipping.
    Out-of-range serving inputs are detectable via
    ``generator_int8_clip_stats``.  Jit-compatible.
    """
    return _mrf_activation_walk(
        cfg, params, mel,
        lambda i, j, y: jnp.max(jnp.abs(y)) * margin,
    )


def generator_int8_clip_stats(
    cfg: HifiGanConfig, params, mel: jax.Array, act_scales: dict
):
    """Clip-rate diagnostic for the static-scale int8 route: the fraction
    of each conv input's elements whose magnitude exceeds the calibrated
    amax (i.e. would be hard-clipped by the kernel).  Returns
    ``{stage_index: [n_convs] f32 fractions}``.  Costs one f32 XLA
    forward — intended as a sampled serving probe
    (``Synthesizer.int8_clip_stats``), not per-request.  Jit-compatible.
    """
    return _mrf_activation_walk(
        cfg, params, mel,
        lambda i, j, y: jnp.mean(
            (jnp.abs(y) > act_scales[i][j]).astype(jnp.float32)
        ),
    )


# ---------------------------------------------------------------------------
# Weight-norm folding.
# ---------------------------------------------------------------------------


def fold_weight_norm(params):
    """Fold ``{v, g}`` weight-normalized kernels into plain ``kernel`` params
    so a generator trained with ``use_wn=True`` loads into ``use_wn=False``."""

    def fold(tree):
        if isinstance(tree, dict):
            if "v" in tree and "g" in tree:
                v, g = tree["v"], tree["g"]
                features = v.shape[-1]
                norm = jnp.linalg.norm(v.reshape(-1, features), axis=0)
                kernel = v * (g / jnp.maximum(norm, 1e-12))
                out = {k: v2 for k, v2 in tree.items() if k not in ("v", "g")}
                out["kernel"] = kernel
                return out
            return {k: fold(v2) for k, v2 in tree.items()}
        return tree

    return fold(params)
