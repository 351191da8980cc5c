"""Per-stage vocoder breakdown on the current backend.

Times, for each upsample stage i: the ConvTranspose alone, the MRF stack
alone (fused Pallas and XLA variants), plus conv_pre/conv_post — using
the amortized chained-fetch methodology (see bench.py): only
device->host fetches synchronize on the tunneled TPU, so each
measurement chains K data-dependent jitted calls and subtracts the K=0
fetch floor.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/profile_vocoder.py [batch] [frames] [dtype]
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.models import Generator
from viettts_tpu.models.hifigan import LRELU_SLOPE, _same_pad
from viettts_tpu.ops.mrf import fused_mrf, mrf_weights_from_params

K = 8


def amortized(step, iters=K, trials=3, *args):
    def chain(n):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s, *args)
        _ = float(s)
        return time.perf_counter() - t0

    chain(1)  # warm / compile
    floor = min(chain(0) for _ in range(trials))
    total = min(chain(iters) for _ in range(trials))
    return max(total - floor, 0.0) / iters


def main(batch=8, n_frames=1024, dtype="float32"):
    quant = dtype == "int8"
    cd = jnp.dtype(jnp.bfloat16 if quant else dtype)
    cfg = Config().hifigan
    gen = Generator(cfg)
    mel0 = jnp.zeros((batch, n_frames, 80), cd)
    gvars = jax.jit(gen.init)(jax.random.PRNGKey(0), mel0.astype(jnp.float32))
    params = gvars["params"]
    num_kernels = len(cfg.resblock_kernel_sizes)

    def conv(name, x, k, dilation=1, sub=None):
        entry = params[name] if sub is None else params[name][sub]
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

    def convt(i, x, u):
        return (
            jax.lax.conv_transpose(
                x.astype(cd), params[f"ups_{i}"]["kernel"].astype(cd),
                strides=(u,),
                padding="SAME", dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=cd,
            )
            + params[f"ups_{i}"]["bias"].astype(cd)
        )

    def xla_mrf(x, stage):
        acc = None
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            block = f"resblock_{stage * num_kernels + j}"
            r = x
            for di, d in enumerate(rd):
                y = jax.nn.leaky_relu(r, LRELU_SLOPE)
                y = conv(block, y, rk, dilation=d, sub=f"convs1_{di}")
                y = jax.nn.leaky_relu(y, LRELU_SLOPE)
                y = conv(block, y, rk, dilation=1, sub=f"convs2_{di}")
                r = y + r
            acc = r if acc is None else acc + r
        return acc / num_kernels

    # Build per-stage input activations once.
    rng = np.random.RandomState(0)
    stage_inputs = []  # input to leaky_relu+convT of stage i
    x = jnp.asarray(rng.randn(batch, n_frames, 80).astype(np.float32))
    x = jax.jit(lambda m: conv("conv_pre", m, 7))(x)
    for i, (u, k) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        stage_inputs.append(x)
        x = jax.jit(
            lambda z, i=i, u=u: convt(i, jax.nn.leaky_relu(z, LRELU_SLOPE), u)
        )(x)
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        if ch <= 128 and 128 % ch == 0:
            weights = mrf_weights_from_params(params, i, num_kernels)
            x = jax.jit(
                lambda z, w=weights: fused_mrf(
                    z, w, cfg.resblock_kernel_sizes,
                    cfg.resblock_dilation_sizes, compute_dtype=cd,
                    quantize_int8=quant,
                )
            )(x)
        else:
            x = jax.jit(lambda z, i=i: xla_mrf(z, i))(x)
    post_in = x

    total = 0.0
    t = amortized(
        jax.jit(lambda dep, m: conv("conv_pre", m + dep * 0, 7)[0, 0, 0]),
        K, 3, mel0,
    )
    total += t
    print(f"conv_pre                    : {t*1e3:8.2f} ms")

    for i, (u, kk) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        xin = stage_inputs[i]

        t_ct = amortized(
            jax.jit(
                lambda dep, z, i=i, u=u: convt(
                    i, jax.nn.leaky_relu(z + dep * 0, LRELU_SLOPE), u
                )[0, 0, 0]
            ),
            K, 3, xin,
        )
        xup = jax.jit(
            lambda z, i=i, u=u: convt(i, jax.nn.leaky_relu(z, LRELU_SLOPE), u)
        )(xin)

        t_xla = amortized(
            jax.jit(lambda dep, z, i=i: xla_mrf(z + dep * 0, i)[0, 0, 0]),
            K, 3, xup,
        )
        line = (
            f"stage {i} (C={ch:3d}, x{u}): convT {t_ct*1e3:7.2f} ms | "
            f"mrf XLA {t_xla*1e3:7.2f} ms"
        )
        if ch <= 512 and (128 % ch == 0 or ch % 128 == 0):
            weights = mrf_weights_from_params(params, i, num_kernels)
            t_fused = amortized(
                jax.jit(
                    lambda dep, z, w=weights: fused_mrf(
                        (z + dep * 0).astype(cd), w,
                        cfg.resblock_kernel_sizes,
                        cfg.resblock_dilation_sizes, compute_dtype=cd,
                        quantize_int8=quant,
                    )[0, 0, 0]
                ),
                K, 3, xup,
            )
            line += f" | mrf fused {t_fused*1e3:7.2f} ms"
            t_fused_ups = amortized(
                jax.jit(
                    lambda dep, z, w=weights, i=i, u=u: fused_mrf(
                        (z + dep * 0).astype(cd), w,
                        cfg.resblock_kernel_sizes,
                        cfg.resblock_dilation_sizes,
                        upsample=(
                            params[f"ups_{i}"]["kernel"],
                            params[f"ups_{i}"]["bias"],
                            u,
                        ),
                        compute_dtype=cd,
                        quantize_int8=quant,
                    )[0, 0, 0]
                ),
                K, 3, xin,
            )
            line += f" | convT+mrf fused {t_fused_ups*1e3:7.2f} ms"
            total += min(t_ct + min(t_fused, t_xla), t_fused_ups)
        else:
            total += t_ct + t_xla
        print(line)

    t = amortized(
        jax.jit(
            lambda dep, z: jnp.tanh(
                conv("conv_post", jax.nn.leaky_relu(z + dep * 0), 7)
            )[0, 0, 0]
        ),
        K, 3, post_in,
    )
    total += t
    print(f"conv_post                   : {t*1e3:8.2f} ms")
    samples = batch * n_frames * 256
    print(
        f"sum of stages               : {total*1e3:8.2f} ms "
        f"({samples/total/1e6:.0f} Msamples/s, batch={batch}, T={n_frames})"
    )


if __name__ == "__main__":
    import sys

    main(
        batch=int(sys.argv[1]) if len(sys.argv) > 1 else 8,
        n_frames=int(sys.argv[2]) if len(sys.argv) > 2 else 1024,
        dtype=sys.argv[3] if len(sys.argv) > 3 else "float32",
    )
