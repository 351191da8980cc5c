"""Convert an upstream PyTorch HiFi-GAN generator checkpoint to native format.

Equivalent of ``python -m vietTTS.hifigan.convert_torch_model_to_haiku``
(reference convert_torch_model_to_haiku.py:27-79), but targets this
framework's flax layout directly.  PyTorch is only needed at conversion
time; the import is gated.

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
    args = parser.parse_args(argv)
    args.output_file.parent.mkdir(parents=True, exist_ok=True)
    convert_file(args.checkpoint_file, args.output_file)
    print("wrote", args.output_file)


if __name__ == "__main__":
    main()
