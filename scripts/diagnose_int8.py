"""Root-cause the int8 vocoder quality collapse on trained weights.

benchmarks/int8_quality.json measured the static-int8 serving route at
~68% waveform rel-RMS vs f32 on the trained GAN checkpoint (dynamic
per-tile scales: 57%) — vs 0.77% on the randomly-initialized generator
the round-3/4 bound used.  This script decomposes the error with a
pure-XLA fake-quantized generator walk (same flat conv order and
quantization scheme as the Pallas kernel, ops/mrf.py:280-357) so each
factor can be isolated on CPU:

* full simulation (per-out-channel int8 weights + per-conv static
  activation scales, 1.25x margin) — should reproduce the kernel's
  measured error; a large gap would indicate a kernel bug instead
* weights-only / activations-only quantization — which side dominates
* per-CHANNEL activation scales (finer than the kernel supports)
* 99.9th-percentile activation clipping (outlier-robust scale)
* per-conv input crest factors (amax / rms) on trained vs random
  weights — peaky activations starve per-tensor int8 of resolution

Usage:
    PYTHONPATH=.:$PYTHONPATH python scripts/diagnose_int8.py \
        [--ckpt /tmp/gan_ckpt/hifigan_latest_ckpt.pickle]

Results -> benchmarks/int8_diagnosis.json.  CPU-friendly (plain XLA,
no Pallas): safe to run while the TPU is busy training.
"""

import argparse
import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.models.hifigan import LRELU_SLOPE, _same_pad
from viettts_tpu.ops.mel import LogMelSpectrogram
from viettts_tpu.train.checkpoint import load_variables

SR = 16000
OUT = Path("benchmarks")


def fake_quant_weight(w):
    """Per-output-channel symmetric int8 fake-quant of a [W, I, O] conv
    kernel (mirrors ops/mrf.py:569-581: per-output-column scales on the
    packed A-matrix == per-output-channel on the original conv)."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1)), 1e-12) / 127.0
    return jnp.round(w / s).clip(-127, 127) * s


def make_act_quant(mode):
    """mode -> f(x, scale_info) applying fake activation quantization.
    scale_info is the calibration record for this conv (see calibrate)."""
    if mode == "none":
        return lambda x, info: x
    if mode in ("per_conv", "p999"):
        def q(x, info):
            a = info[mode]
            s = a / 127.0
            return jnp.round(jnp.clip(x, -a, a) / s) * s
        return q
    if mode == "per_channel":
        def q(x, info):
            a = info["per_channel"]  # [C]
            s = a / 127.0
            return jnp.round(jnp.clip(x, -a, a) / s) * s
        return q
    raise ValueError(mode)


def generator_walk(cfg, params, mel, *, quant_w=False, act_mode="none",
                   calib=None, record=None):
    """Plain-XLA generator forward with optional fake quantization of the
    MRF convs (conv_pre / ConvTranspose / conv_post stay f32, exactly the
    kernel's quantization boundary).  With record != None, appends
    per-conv input stats instead of quantizing."""
    num_kernels = len(cfg.resblock_kernel_sizes)
    act_q = make_act_quant(act_mode)
    counter = [0]

    def conv(name, x, k, dilation=1, sub=None, mrf=False):
        entry = params[name] if sub is None else params[name][sub]
        w = entry["kernel"].astype(jnp.float32)
        if mrf:
            if record is not None:
                record.append(
                    {
                        "amax": float(jnp.max(jnp.abs(x))),
                        "rms": float(jnp.sqrt(jnp.mean(x * x))),
                        "p999": float(jnp.percentile(jnp.abs(x), 99.9)),
                        "per_channel": np.asarray(
                            jnp.max(jnp.abs(x), axis=(0, 1))
                        ).tolist(),
                    }
                )
            else:
                if calib is not None:
                    x = act_q(x, calib[counter[0]])
                if quant_w:
                    w = fake_quant_weight(w)
            counter[0] += 1
        p = _same_pad(k, dilation)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=((p, p),),
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        return y + entry["bias"].astype(jnp.float32)

    x = conv("conv_pre", mel.astype(jnp.float32), 7)
    for i, u in enumerate(cfg.upsample_rates):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = (
            jax.lax.conv_transpose(
                x, params[f"ups_{i}"]["kernel"].astype(jnp.float32),
                strides=(u,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
            )
            + params[f"ups_{i}"]["bias"].astype(jnp.float32)
        )
        acc = None
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            block = f"resblock_{i * num_kernels + j}"
            r = x
            for di, d in enumerate(rd):
                y = jax.nn.leaky_relu(r, LRELU_SLOPE)
                if cfg.resblock == "1":
                    y = conv(block, y, rk, dilation=d, sub=f"convs1_{di}",
                             mrf=True)
                    y = jax.nn.leaky_relu(y, LRELU_SLOPE)
                    y = conv(block, y, rk, dilation=1, sub=f"convs2_{di}",
                             mrf=True)
                else:
                    y = conv(block, y, rk, dilation=d, sub=f"convs_{di}",
                             mrf=True)
                r = y + r
            acc = r if acc is None else acc + r
        x = acc / num_kernels
    x = jax.nn.leaky_relu(x, LRELU_SLOPE)
    x = conv("conv_post", x, 7)
    return jnp.tanh(x)


def rel_rms(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.sqrt(((a - b) ** 2).mean()) / max(np.sqrt((b**2).mean()), 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--ckpt", default="/tmp/gan_ckpt/hifigan_latest_ckpt.pickle"
    )
    ap.add_argument("--margin", type=float, default=1.25)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    cfg = Config()

    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from validate_gan import heldout_clip, _synth_clip

    variables = load_variables(args.ckpt, "hifigan")
    params = variables["params"]

    mel_fn = LogMelSpectrogram(cfg.dsp)
    jitted_mel = jax.jit(lambda w: mel_fn(w[None]))
    hop = cfg.dsp.hop_length

    def clip_mel(w):
        w = w[: len(w) // hop * hop]
        return jitted_mel(jnp.asarray(w))

    # calibration clip (disjoint from eval), eval = held-out probe
    rng = np.random.RandomState(0)
    t = np.arange(SR * 2) / SR
    cal_wav = _synth_clip(rng, t).astype(np.float32)
    eval_wav = heldout_clip()

    cal_mel = clip_mel(cal_wav)
    eval_mel = clip_mel(eval_wav)

    hcfg = cfg.hifigan

    # 1. calibration pass: record per-conv input stats on the cal mel
    record = []
    generator_walk(hcfg, params, cal_mel, record=record)
    calib = [
        {
            "per_conv": r["amax"] * args.margin,
            "p999": r["p999"],
            "per_channel": jnp.asarray(r["per_channel"]) * args.margin,
        }
        for r in record
    ]
    crest = [r["amax"] / max(r["rms"], 1e-12) for r in record]

    ref = generator_walk(hcfg, params, eval_mel)

    variants = {
        "full_static_per_conv": dict(quant_w=True, act_mode="per_conv"),
        "weights_only": dict(quant_w=True, act_mode="none"),
        "acts_only_per_conv": dict(quant_w=False, act_mode="per_conv"),
        "acts_per_channel": dict(quant_w=True, act_mode="per_channel"),
        "acts_p999_clip": dict(quant_w=True, act_mode="p999"),
    }
    results = {}
    for name, kw in variants.items():
        wav = generator_walk(hcfg, params, eval_mel, calib=calib, **kw)
        results[name] = rel_rms(wav, ref)
        print(f"{name:24s} rel-RMS vs f32: {results[name]:.4%}", flush=True)

    out = {
        "ckpt": args.ckpt,
        "margin": args.margin,
        "kernel_measured_static": "see benchmarks/int8_quality.json",
        "rel_rms_vs_f32": results,
        "mrf_input_crest_factors": {
            "min": min(crest), "max": max(crest),
            "mean": float(np.mean(crest)),
            "per_conv": [round(c, 1) for c in crest],
        },
    }
    OUT.mkdir(exist_ok=True)
    with open(OUT / "int8_diagnosis.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["mrf_input_crest_factors"]["per_conv"][:12]))
    print("wrote benchmarks/int8_diagnosis.json")


if __name__ == "__main__":
    main()
