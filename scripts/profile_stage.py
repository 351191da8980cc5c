"""Single-stage vocoder routing experiment on the current backend.

Measures one upsample stage (ConvTranspose + MRF) three ways at the
serving sub-batch (bf16 storage):

  1. XLA   : lrelu -> conv_transpose -> 18-conv MRF
  2. hybrid: XLA convT -> fused_mrf (Pallas, weight-resident)
  3. fused : fused_mrf(upsample=...) (single Pallas kernel)

The stage input is built by running the real generator front (conv_pre +
earlier stages) on random mel, so activation statistics and layouts match
serving.  Measured v5e results live in models/hifigan.py's routing
comment (stage 0 stays on XLA; C<=128 stages fuse).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_stage.py [stage] [batch] [frames] [--check]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.models import Generator
from viettts_tpu.models.hifigan import LRELU_SLOPE, _same_pad
from viettts_tpu.ops.mrf import fused_mrf, mrf_weights_from_params

K = 8
RESIDENT_BUDGET = 24 * 1024 * 1024


def amortized(step, arg, iters=K, trials=3):
    def chain(n):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s, arg)
        _ = float(s)
        return time.perf_counter() - t0

    chain(1)
    floor = min(chain(0) for _ in range(trials))
    total = min(chain(iters) for _ in range(trials))
    return max(total - floor, 1e-9) / iters


def main(stage=1, batch=16, n_frames=768):
    cd = jnp.bfloat16
    cfg = Config().hifigan
    gen = Generator(cfg)
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)))
    params = gvars["params"]
    num_kernels = len(cfg.resblock_kernel_sizes)
    u = cfg.upsample_rates[stage]
    ch = cfg.upsample_initial_channel // (2 ** (stage + 1))

    def conv(x, entry, k, dilation=1):
        p = _same_pad(k, dilation)
        return (
            jax.lax.conv_general_dilated(
                x.astype(cd), entry["kernel"].astype(cd), (1,), ((p, p),),
                rhs_dilation=(dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=cd,
            )
            + entry["bias"].astype(cd)
        )

    def convt(i, x):
        return (
            jax.lax.conv_transpose(
                jax.nn.leaky_relu(x, LRELU_SLOPE).astype(cd),
                params[f"ups_{i}"]["kernel"].astype(cd),
                strides=(cfg.upsample_rates[i],), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=cd,
            )
            + params[f"ups_{i}"]["bias"].astype(cd)
        )

    def xla_mrf(i, x):
        acc = None
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            block = params[f"resblock_{i * num_kernels + j}"]
            r = x
            for di, d in enumerate(rd):
                y = jax.nn.leaky_relu(r, LRELU_SLOPE)
                y = conv(y, block[f"convs1_{di}"], rk, dilation=d)
                y = jax.nn.leaky_relu(y, LRELU_SLOPE)
                y = conv(y, block[f"convs2_{di}"], rk, dilation=1)
                r = y + r
            acc = r if acc is None else acc + r
        return acc / num_kernels

    # stage input: run the XLA front (conv_pre + stages < stage) once
    def front(mel):
        x = conv(mel, params["conv_pre"], 7)
        for i in range(stage):
            x = xla_mrf(i, convt(i, x))
        return x

    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(batch, n_frames, 80).astype(np.float32), cd)
    x0 = jax.jit(front)(mel)
    x0.block_until_ready()

    weights = mrf_weights_from_params(params, stage, num_kernels)
    ups = (params[f"ups_{stage}"]["kernel"], params[f"ups_{stage}"]["bias"], u)

    io_dtype = os.environ.get("VIETTTS_PROFILE_IO")  # e.g. float32

    f_xla = jax.jit(
        lambda s, x: xla_mrf(stage, convt(stage, x + s.astype(cd) * 0))
    )
    f_hyb = jax.jit(
        lambda s, x: fused_mrf(
            convt(stage, x + s.astype(cd) * 0), weights,
            cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes,
            compute_dtype=cd, resident_budget=RESIDENT_BUDGET,
        )
    )
    # NB: with ``upsample=`` the kernel applies the pre-ConvT leaky_relu
    # itself — pass the raw stage input.
    f_fus = jax.jit(
        lambda s, x: fused_mrf(
            x + s.astype(cd) * 0, weights,
            cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes,
            upsample=ups, compute_dtype=cd, io_dtype=io_dtype,
            resident_budget=RESIDENT_BUDGET,
        )
    )

    routes = [("XLA", f_xla), ("hybrid", f_hyb), ("fused", f_fus)]
    if "--int8" in sys.argv:
        # int8-quantized fused routes (dynamic and static scales), for
        # probing stages the serving router keeps on XLA (e.g. stage 0).
        f_q = jax.jit(
            lambda s, x: fused_mrf(
                x + s.astype(cd) * 0, weights,
                cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes,
                upsample=ups, compute_dtype=cd,
                resident_budget=RESIDENT_BUDGET, quantize_int8=True,
            )
        )
        from viettts_tpu.models.hifigan import generator_calibrate_int8

        scales = jax.jit(
            lambda m: generator_calibrate_int8(cfg, params, m)
        )(jnp.asarray(rng.randn(2, n_frames, 80).astype(np.float32) * 0.5))
        f_qs = jax.jit(
            lambda s, x: fused_mrf(
                x + s.astype(cd) * 0, weights,
                cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes,
                upsample=ups, compute_dtype=cd,
                resident_budget=RESIDENT_BUDGET, quantize_int8=True,
                act_scales=scales[stage],
            )
        )
        routes += [("int8", f_q), ("int8st", f_qs)]

    if "--check" in sys.argv:
        ref = np.asarray(f_xla(jnp.float32(0), x0[:2]), np.float32)
        for name, f in routes[1:]:
            out = np.asarray(f(jnp.float32(0), x0[:2]), np.float32)
            d = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-6)
            print(f"{name:6s} rel max|delta| vs XLA: {d:.3e}", flush=True)

    for name, f in routes:
        t = amortized(lambda s, x, f=f: f(s, x)[0, 0, 0], x0)
        print(
            f"stage{stage} C={ch} {name:6s}: {t*1e3:8.2f} ms"
            f"  (B={batch}, T={n_frames})",
            flush=True,
        )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(
        stage=int(args[0]) if len(args) > 0 else 1,
        batch=int(args[1]) if len(args) > 1 else 16,
        n_frames=int(args[2]) if len(args) > 2 else 768,
    )
