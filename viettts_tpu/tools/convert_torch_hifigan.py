"""Convert upstream PyTorch HiFi-GAN checkpoints to native format.

Equivalent of ``python -m vietTTS.hifigan.convert_torch_model_to_haiku``
(reference convert_torch_model_to_haiku.py:27-79), but targets this
framework's flax layout directly, and additionally converts the upstream
``do_*`` discriminator checkpoints (MPD + MSD) so GTA finetuning
(train/hifigan.py --disc-init) warm-starts from the trained
discriminators instead of cold ones — the reference's finetune recipe
resumes both ``g_*`` and ``do_*`` (README.md:88-100 -> upstream
hifi-gan train.py).  PyTorch is only needed at conversion time; the
import is gated.

Torch generator state dict layout (after weight-norm fusion):
  conv_pre.{weight,bias}        weight (O, I, W)      -> conv_pre (W, I, O)
  ups.N.{weight,bias}           weight (I, O, W)      -> ups_N    (W, I, O)
  resblocks.X.convsY.Z.{...}    weight (O, I, W)      -> resblock_X/convsY_Z
  conv_post.{weight,bias}                              -> conv_post

Regular convs transpose (O, I, W) -> (W, I, O).  ConvTranspose weights in
torch are (in, out, W) and torch *flips* the kernel; lax.conv_transpose
does not, so the spatial axis is reversed: (I, O, W) -> flip(W) -> (W, I, O).
(The reference achieves the same with rot90 into haiku's (W, O, I) layout,
convert_torch_model_to_haiku.py:52-58.)

Discriminator layouts (reference torch_model.py:221-380):
  MPD ``discriminators.{i}.convs.{j}`` are weight-normalized Conv2d —
  ``weight_v`` (O, I, kh, kw) -> v (kh, kw, I, O), ``weight_g``
  (O, 1, 1, 1) -> g (O,); the norm is over all non-output axes in both
  frameworks, so keeping {v, g} (rather than fusing) preserves the
  trainable reparameterization exactly.  MSD ``discriminators.0`` is
  spectral-normalized (torch_model.py:322-326): ``weight_orig``
  (O, I/g, k) -> kernel (k, I/g, O) and the power-iteration vector
  ``weight_u`` (O,) -> the 'spectral' collection; sigma is invariant to
  the column permutation the layout change induces, so the stored u
  transfers directly.  Scales 1-2 are weight-normalized Conv1d.
"""

from __future__ import annotations

import pickle
import re
from pathlib import Path
from typing import Any, Dict

import numpy as np

from viettts_tpu.train.checkpoint import NATIVE_FORMAT, save_checkpoint


def _fuse_weight_norm(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Fuse torch weight_norm (weight_g, weight_v) pairs into plain
    weights.  torch norms over all axes except dim 0."""
    out: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        arr = val.detach().cpu().numpy() if hasattr(val, "detach") else np.asarray(val)
        if key.endswith("weight_v"):
            base = key[: -len("_v")]
            g = sd[base + "_g"]
            g = g.detach().cpu().numpy() if hasattr(g, "detach") else np.asarray(g)
            flat = arr.reshape(arr.shape[0], -1)
            norm = np.linalg.norm(flat, axis=1).reshape(
                (-1,) + (1,) * (arr.ndim - 1)
            )
            out[base] = arr * (g / np.maximum(norm, 1e-12))
        elif key.endswith("weight_g"):
            continue
        else:
            out[key] = arr
    return out


def convert_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Torch generator state dict -> flax Generator params (use_wn=False)."""
    sd = _fuse_weight_norm(sd)
    params: Dict[str, Any] = {}

    def put(path, leaf, value):
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node.setdefault(path[-1], {})[leaf] = value

    for key, arr in sd.items():
        if key.startswith("conv_pre"):
            name, path = key.split(".")[-1], ("conv_pre",)
        elif key.startswith("conv_post"):
            name, path = key.split(".")[-1], ("conv_post",)
        elif key.startswith("ups."):
            _, idx, name = key.split(".")
            path = (f"ups_{idx}",)
        elif key.startswith("resblocks."):
            _, x, conv, z, name = key.split(".")
            path = (f"resblock_{x}", f"{conv}_{z}")
        else:
            raise ValueError(f"unexpected torch key {key}")

        if name == "bias":
            put(path, "bias", arr)
        elif name == "weight":
            if path[0].startswith("ups_"):
                # torch ConvTranspose1d (I, O, W), flipped kernel
                kernel = np.flip(np.transpose(arr, (2, 0, 1)), 0).copy()
            else:
                # torch Conv1d (O, I, W)
                kernel = np.transpose(arr, (2, 1, 0))
            put(path, "kernel", kernel)
        else:
            raise ValueError(f"unexpected leaf {name} in {key}")
    return {"params": params}


def _np(val) -> np.ndarray:
    return (
        val.detach().cpu().numpy() if hasattr(val, "detach") else np.asarray(val)
    )


def _convert_disc_conv(sd: Dict[str, Any], prefix: str, is_2d: bool):
    """One discriminator conv layer (torch key prefix) -> flax param dict.

    Weight-normalized layers keep the {v, g} reparameterization;
    spectral-normalized layers yield {kernel, bias} plus the u vector
    (returned separately for the 'spectral' collection)."""
    transpose = (2, 3, 1, 0) if is_2d else (2, 1, 0)
    out: Dict[str, np.ndarray] = {"bias": _np(sd[f"{prefix}.bias"])}
    u = None
    if f"{prefix}.weight_g" in sd:
        out["v"] = np.transpose(_np(sd[f"{prefix}.weight_v"]), transpose)
        out["g"] = _np(sd[f"{prefix}.weight_g"]).reshape(-1)
    elif f"{prefix}.weight_orig" in sd:
        out["kernel"] = np.transpose(
            _np(sd[f"{prefix}.weight_orig"]), transpose
        )
        u = _np(sd[f"{prefix}.weight_u"])
    else:  # plain conv (not produced by upstream, but cheap to accept)
        out["kernel"] = np.transpose(_np(sd[f"{prefix}.weight"]), transpose)
    return out, u


def convert_discriminators(
    mpd_sd: Dict[str, Any],
    msd_sd: Dict[str, Any],
    periods=(2, 3, 5, 7, 11),
    num_scales: int = 3,
):
    """Torch MPD/MSD state dicts -> (disc_params, spectral) matching
    ``GanState.disc_params`` / ``GanState.spectral``
    (train/hifigan.py:60-68).  MPD layer names: conv_0..conv_4 +
    conv_post per period; MSD: conv_0..conv_6 + conv_post per scale."""
    mpd: Dict[str, Any] = {}
    for i, p in enumerate(periods):
        layers: Dict[str, Any] = {}
        for j in range(5):
            layers[f"conv_{j}"], _ = _convert_disc_conv(
                mpd_sd, f"discriminators.{i}.convs.{j}", is_2d=True
            )
        layers["conv_post"], _ = _convert_disc_conv(
            mpd_sd, f"discriminators.{i}.conv_post", is_2d=True
        )
        mpd[f"disc_p{p}"] = layers

    msd: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}
    for i in range(num_scales):
        layers = {}
        us: Dict[str, Any] = {}
        for j in range(7):
            layers[f"conv_{j}"], u = _convert_disc_conv(
                msd_sd, f"discriminators.{i}.convs.{j}", is_2d=False
            )
            if u is not None:
                us[f"conv_{j}"] = {"u": u}
        layers["conv_post"], u = _convert_disc_conv(
            msd_sd, f"discriminators.{i}.conv_post", is_2d=False
        )
        if u is not None:
            us["conv_post"] = {"u": u}
        msd[f"disc_s{i}"] = layers
        if us:
            spectral[f"disc_s{i}"] = us
    return {"mpd": mpd, "msd": msd}, spectral


def convert_do_file(do_file: Path, output_file: Path) -> None:
    """Convert an upstream ``do_*`` checkpoint (discriminators + optimizer)
    to a native discriminator-init pickle for --disc-init warm-starting.
    Optimizer moments are NOT converted (torch Adam state does not map
    onto an optax chain portably); finetuning re-accumulates them, which
    costs a few hundred steps of bias correction."""
    import torch  # conversion-time only

    ckpt = torch.load(do_file, map_location="cpu", weights_only=True)
    disc_params, spectral = convert_discriminators(ckpt["mpd"], ckpt["msd"])
    save_checkpoint(
        output_file,
        {
            "format": NATIVE_FORMAT,
            "step": int(ckpt.get("steps", 0)),
            "disc_params": disc_params,
            "spectral": spectral,
        },
    )


def convert_file(checkpoint_file: Path, output_file: Path) -> None:
    import torch  # conversion-time only

    ckpt = torch.load(checkpoint_file, map_location="cpu", weights_only=True)
    sd = ckpt.get("generator", ckpt)
    variables = convert_state_dict(sd)
    save_checkpoint(
        output_file,
        {"format": NATIVE_FORMAT, "step": 0, "variables": variables},
    )


def main(argv=None):
    from argparse import ArgumentParser

    parser = ArgumentParser(description="Convert torch HiFi-GAN to native")
    parser.add_argument("--checkpoint-file", type=Path, required=True)
    parser.add_argument(
        "--output-file", type=Path,
        default=Path("assets/infore/hifigan/hifigan_latest_ckpt.pickle"),
    )
    parser.add_argument(
        "--do-file", type=Path, default=None,
        help="upstream do_* checkpoint (MPD+MSD); converted for "
             "train/hifigan.py --disc-init warm-starting",
    )
    parser.add_argument(
        "--disc-output-file", type=Path, default=None,
        help="output for --do-file (default: hifigan_disc_ckpt.pickle "
             "next to --output-file)",
    )
    args = parser.parse_args(argv)
    args.output_file.parent.mkdir(parents=True, exist_ok=True)
    convert_file(args.checkpoint_file, args.output_file)
    print("wrote", args.output_file)
    if args.do_file is not None:
        disc_out = args.disc_output_file or (
            args.output_file.parent / "hifigan_disc_ckpt.pickle"
        )
        convert_do_file(args.do_file, disc_out)
        print("wrote", disc_out)


if __name__ == "__main__":
    main()
