"""Checkpoint I/O: native format plus readers for the reference's pickles.

Native format: a single pickle of numpy-ified pytrees
``{step, params, batch_stats, rng, opt_state}`` written atomically — the
same philosophy as the reference (utils.py:7-27) so operational muscle
memory transfers, with Orbax available for sharded checkpoints later.

Reference-compat readers convert the three reference checkpoint flavours:

* ``duration_latest_ckpt.pickle``  (haiku params+state, utils.py:17-27)
* ``acoustic_latest_ckpt.pickle``  (haiku params+state, acoustic_trainer.py:162-173)
* ``hk_hifi.pickle``               (flat {haiku_path: {w, b}} generator,
  convert_torch_model_to_haiku.py:48-62)

into this framework's flax variable trees.  The haiku module names were
pinned empirically against dm-haiku (embed->embeddings, conv1_d_N,
batch_norm_N with (1,1,C) scale/offset and EMA state, lstm_N/linear with
fused [x;h] weights, Conv1DTranspose kernels (W,O,I) == ours.swapaxes(1,2)).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.ops.rnn import LSTMParams


# ---------------------------------------------------------------------------
# Native checkpoint format.
# ---------------------------------------------------------------------------


def _to_numpy(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str | Path, payload: Dict[str, Any]) -> None:
    """Atomically pickle a checkpoint dict (arrays are numpy-ified)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f)
    tmp.replace(path)


def load_checkpoint(path: str | Path) -> Optional[Dict[str, Any]]:
    path = Path(path)
    if not path.exists():
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


# ---------------------------------------------------------------------------
# Orbax (sharded / async) checkpoints — for large multi-host runs where a
# single pickle is impractical.  Same payload contract as save_checkpoint.
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(dirpath: str | Path, payload: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    dirpath = Path(dirpath).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dirpath, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(
    dirpath: str | Path, template: Optional[Dict[str, Any]] = None
) -> Optional[Dict[str, Any]]:
    import orbax.checkpoint as ocp

    dirpath = Path(dirpath).resolve()
    if not dirpath.exists():
        return None
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(dirpath, template)
    return ckptr.restore(dirpath)


# ---------------------------------------------------------------------------
# Haiku conversion helpers.
# ---------------------------------------------------------------------------


def _split_lstm(
    linear: Dict[str, np.ndarray], input_dim: Optional[int] = None
) -> LSTMParams:
    """Split haiku's fused concat([x, h]) weight into (w_i, w_h).  The
    hidden size is always 4H along the output axis, so the input size can
    be inferred when not given."""
    w = np.asarray(linear["w"])
    b = np.asarray(linear["b"])
    hidden = w.shape[1] // 4
    if input_dim is None:
        input_dim = w.shape[0] - hidden
    assert w.shape[0] == input_dim + hidden, (w.shape, input_dim, hidden)
    return LSTMParams(
        w_i=jnp.asarray(w[:input_dim]),
        w_h=jnp.asarray(w[input_dim:]),
        b=jnp.asarray(b),
    )


def _conv(entry: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {
        "kernel": jnp.asarray(entry["w"]),
        "bias": jnp.asarray(entry["b"]),
    }


def _bn_params(entry: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(np.asarray(entry["scale"]).reshape(-1)),
        "bias": jnp.asarray(np.asarray(entry["offset"]).reshape(-1)),
    }


def _bn_stats(
    state: Dict[str, Dict[str, np.ndarray]], prefix: str
) -> Dict[str, jnp.ndarray]:
    mean = np.asarray(state[f"{prefix}/~/mean_ema"]["average"]).reshape(-1)
    var = np.asarray(state[f"{prefix}/~/var_ema"]["average"]).reshape(-1)
    return {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}


def _suffixed(base: str, i: int) -> str:
    return base if i == 0 else f"{base}_{i}"


def _convert_token_encoder(
    hk_params: Dict, hk_state: Dict, scope: str
) -> Tuple[Dict, Dict]:
    """Convert a haiku TokenEncoder scope to our flax encoder trees."""
    p = {}
    s = {}
    p["embed"] = {
        "embedding": jnp.asarray(hk_params[f"{scope}/~/embed"]["embeddings"])
    }
    for i in range(3):
        conv = hk_params[f"{scope}/~/{_suffixed('conv1_d', i)}"]
        bn = hk_params[f"{scope}/~/{_suffixed('batch_norm', i)}"]
        p[f"conv_{i}"] = _conv(conv)
        p[f"bn_{i}"] = _bn_params(bn)
        s[f"bn_{i}"] = _bn_stats(hk_state, f"{scope}/~/{_suffixed('batch_norm', i)}")
    p["lstm_fwd"] = _split_lstm(hk_params[f"{scope}/~/lstm/linear"])
    p["lstm_bwd"] = _split_lstm(hk_params[f"{scope}/~/lstm_1/linear"])
    return p, s


def convert_haiku_duration(hk_params: Dict, hk_state: Dict) -> Dict[str, Any]:
    """Reference duration checkpoint trees -> flax variables.  All model
    dimensions are inferred from the weight shapes."""
    root = "duration_model"
    enc_p, enc_s = _convert_token_encoder(
        hk_params, hk_state, f"{root}/~/token_encoder"
    )
    params = {
        "encoder": enc_p,
        "proj_0": {
            "kernel": jnp.asarray(hk_params[f"{root}/~/linear"]["w"]),
            "bias": jnp.asarray(hk_params[f"{root}/~/linear"]["b"]),
        },
        "proj_1": {
            "kernel": jnp.asarray(hk_params[f"{root}/~/linear_1"]["w"]),
            "bias": jnp.asarray(hk_params[f"{root}/~/linear_1"]["b"]),
        },
    }
    return {"params": params, "batch_stats": {"encoder": enc_s}}


def convert_haiku_acoustic(hk_params: Dict, hk_state: Dict) -> Dict[str, Any]:
    """Reference acoustic checkpoint trees -> flax variables.  Dimensions
    are inferred from weight shapes.

    Haiku creation order (reference model.py:76-93): token_encoder, decoder
    LSTMs (lstm, lstm_1), projection (linear), prenet (linear_1, linear_2,
    bias-free), postnet (conv1_d..conv1_d_4, batch_norm..batch_norm_3).
    """
    root = "acoustic_model"
    enc_p, enc_s = _convert_token_encoder(
        hk_params, hk_state, f"{root}/~/token_encoder"
    )
    params: Dict[str, Any] = {
        "encoder": enc_p,
        "decoder_lstm1": _split_lstm(hk_params[f"{root}/~/lstm/linear"]),
        "decoder_lstm2": _split_lstm(hk_params[f"{root}/~/lstm_1/linear"]),
        "projection": {
            "kernel": jnp.asarray(hk_params[f"{root}/~/linear"]["w"]),
            "bias": jnp.asarray(hk_params[f"{root}/~/linear"]["b"]),
        },
        "prenet_fc1": {
            "kernel": jnp.asarray(hk_params[f"{root}/~/linear_1"]["w"])
        },
        "prenet_fc2": {
            "kernel": jnp.asarray(hk_params[f"{root}/~/linear_2"]["w"])
        },
    }
    stats: Dict[str, Any] = {"encoder": enc_s}
    for i in range(5):
        params[f"postnet_conv_{i}"] = _conv(
            hk_params[f"{root}/~/{_suffixed('conv1_d', i)}"]
        )
    for i in range(4):
        bn = f"{root}/~/{_suffixed('batch_norm', i)}"
        params[f"postnet_bn_{i}"] = _bn_params(hk_params[bn])
        stats[f"postnet_bn_{i}"] = _bn_stats(hk_state, bn)
    return {"params": params, "batch_stats": stats}


def convert_haiku_hifigan(
    flat: Dict[str, Dict[str, np.ndarray]],
    num_upsamples: int = 4,
    num_resblocks: int = 12,
    resblock_convs: int = 3,
    resblock_version: str = "1",
) -> Dict[str, Any]:
    """``hk_hifi.pickle`` (flat {haiku_path: {w, b}}) -> flax Generator
    params (use_wn=False layout).

    Haiku ConvTranspose kernels are (W, O, I); ours are (W, I, O) — a
    swapaxes(1, 2), verified exact against hk.Conv1DTranspose.
    """
    params: Dict[str, Any] = {}
    params["conv_pre"] = _conv(flat["generator/~/conv1_d"])
    params["conv_post"] = _conv(flat["generator/~/conv1_d_1"])
    for i in range(num_upsamples):
        entry = flat[f"generator/~/ups_{i}"]
        params[f"ups_{i}"] = {
            "kernel": jnp.asarray(np.swapaxes(np.asarray(entry["w"]), 1, 2)),
            "bias": jnp.asarray(entry["b"]),
        }
    for r in range(num_resblocks):
        scope = f"generator/~/res_block{resblock_version}_{r}"
        block: Dict[str, Any] = {}
        for j in range(resblock_convs):
            if resblock_version == "1":
                block[f"convs1_{j}"] = _conv(flat[f"{scope}/~/convs1_{j}"])
                block[f"convs2_{j}"] = _conv(flat[f"{scope}/~/convs2_{j}"])
            else:
                block[f"convs_{j}"] = _conv(flat[f"{scope}/~/convs_{j}"])
        params[f"resblock_{r}"] = block
    return {"params": params}


# ---------------------------------------------------------------------------
# File-level loaders for the reference checkpoint files.
# ---------------------------------------------------------------------------

NATIVE_FORMAT = "viettts_tpu/v1"


def load_reference_duration_ckpt(path: str | Path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        dic = pickle.load(f)
    return convert_haiku_duration(dic["params"], dic["aux"])


def load_reference_acoustic_ckpt(path: str | Path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        dic = pickle.load(f)
    return convert_haiku_acoustic(dic["params"], dic["aux"])


def load_reference_hifigan_ckpt(path: str | Path) -> Dict[str, Any]:
    with open(path, "rb") as f:
        flat = pickle.load(f)
    return convert_haiku_hifigan(flat)


def _is_native(dic: Dict) -> bool:
    return isinstance(dic, dict) and dic.get("format") == NATIVE_FORMAT


def load_variables(path: str | Path, kind: str) -> Dict[str, Any]:
    """Auto-detecting loader: reads either a native viettts_tpu checkpoint
    or a reference-format pickle and returns flax variables.

    kind: 'duration' | 'acoustic' | 'hifigan'.
    """
    with open(path, "rb") as f:
        dic = pickle.load(f)
    if _is_native(dic):
        return dic["variables"]
    if kind == "duration":
        return convert_haiku_duration(dic["params"], dic["aux"])
    if kind == "acoustic":
        return convert_haiku_acoustic(dic["params"], dic["aux"])
    if kind == "hifigan":
        return convert_haiku_hifigan(dic)
    raise ValueError(f"unknown checkpoint kind {kind!r}")
