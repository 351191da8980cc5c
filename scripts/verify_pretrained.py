"""Golden verification against the ACTUAL pretrained reference checkpoints.

The BASELINE.md parity contract ("mel + wave within 1e-3 of reference")
is proven in-repo against randomly initialized real reference nets
(tests/test_reference_parity.py) — the strongest proof an offline
container permits.  This script closes the loop the moment the real
weights are reachable: on any machine with network (or with the files
pre-placed), it

1. downloads the three pretrained checkpoints the reference's
   quick_start.sh uses (/root/reference/scripts/quick_start.sh:6-12) —
   ``duration_latest_ckpt.pickle``, ``acoustic_latest_ckpt.pickle`` and
   the torch HiFi-GAN ``g_01140000`` — from HF ``ntt123/viettts_infore_16k``,
   verifying sha256 against ``scripts/pretrained.sha256.json``
   (``--update-lock`` records the hashes on first fetch);
2. converts the torch vocoder with our converter
   (viettts_tpu/tools/convert_torch_hifigan.py);
3. runs the REFERENCE implementation's own ``text2mel`` + HiFi-GAN
   generator (imported from ``--reference``) and our pipeline on the same
   text from the same weights, stochastic layers neutralized identically
   on both sides (the reference's always-on prenet dropout / zoneout,
   nat/model.py:95-100,154-166);
4. asserts mel max-err <= 1e-3 and waveform max-err <= 1e-3 and prints a
   one-line JSON verdict.

Usage:
    PYTHONPATH=. python scripts/verify_pretrained.py \
        [--ckpt-dir assets/infore/nat] [--reference /root/reference] \
        [--text "..."] [--update-lock]

``tests/test_pretrained_golden.py`` runs the same comparison under
pytest, auto-skipping when the checkpoint files are absent.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import sys
import types
import urllib.request
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
BASE_URL = "https://huggingface.co/ntt123/viettts_infore_16k/resolve/main"
LOCK_FILE = Path(__file__).resolve().parent / "pretrained.sha256.json"
FILES = (
    "duration_latest_ckpt.pickle",
    "acoustic_latest_ckpt.pickle",
    "g_01140000",
)
DEMO_TEXT = "hôm qua em tới trường mẹ dắt tay từng bước"


def sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def ensure_files(ckpt_dir: Path, update_lock: bool = False) -> None:
    """Download missing checkpoints and verify hashes against the lock."""
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    lock = (
        json.loads(LOCK_FILE.read_text()) if LOCK_FILE.exists() else {}
    )
    changed = False
    for name in FILES:
        dst = ckpt_dir / name
        if not dst.exists():
            url = f"{BASE_URL}/{name}"
            print(f"downloading {url}", file=sys.stderr)
            tmp = dst.with_suffix(dst.suffix + ".part")
            urllib.request.urlretrieve(url, tmp)
            tmp.rename(dst)
        digest = sha256(dst)
        pinned = lock.get(name)
        if pinned is None:
            print(
                f"note: no pinned sha256 for {name} "
                f"(got {digest}); run with --update-lock to record it",
                file=sys.stderr,
            )
            if update_lock:
                lock[name] = digest
                changed = True
        elif pinned != digest:
            raise SystemExit(
                f"sha256 mismatch for {name}: expected {pinned}, "
                f"got {digest}"
            )
    if changed:
        LOCK_FILE.write_text(json.dumps(lock, indent=2) + "\n")
        print(f"wrote {LOCK_FILE}", file=sys.stderr)


# ---------------------------------------------------------------------------
# Reference import harness (same shims as tests/test_reference_parity.py).
# ---------------------------------------------------------------------------


def load_reference(reference: Path):
    """Import the real vietTTS package with the container shims."""
    import jax

    if not (reference / "vietTTS").is_dir():
        return None
    from viettts_tpu.ops.mel import mel_filterbank

    if "librosa" not in sys.modules:
        librosa = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")

        def mel(*, sr, n_fft, n_mels, fmin, fmax):
            return np.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))

        filters.mel = mel
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.filters"] = filters
    if "textgrid" not in sys.modules:
        sys.modules["textgrid"] = types.ModuleType("textgrid")
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map

    sys.path.insert(0, str(reference))
    try:
        import vietTTS.hifigan.model as hifigan_model
        import vietTTS.nat.config as nat_config
        import vietTTS.nat.model as nat_model
        import vietTTS.nat.text2mel as nat_text2mel
    finally:
        sys.path.remove(str(reference))
    import haiku as hk

    return types.SimpleNamespace(
        hk=hk,
        config=nat_config,
        model=nat_model,
        text2mel=nat_text2mel,
        hifigan_model=hifigan_model,
    )


def neutralize_stochastic(ref) -> None:
    """Make both implementations deterministic and identical: reference
    hk.dropout -> identity, zoneout bernoulli -> keep-new-state."""
    import jax
    import jax.numpy as jnp

    ref.hk.dropout = lambda rng, rate, x: x

    def no_bernoulli(key, p=0.5, shape=None):
        return jnp.zeros(() if shape is None else shape, jnp.bool_)

    jax.random.bernoulli = no_bernoulli


def compare(
    ckpt_dir: Path,
    reference: Path,
    text: str = DEMO_TEXT,
    silence_duration: float = 0.2,
) -> dict:
    """Reference text2mel + generator vs our pipeline on the same weights.
    Returns the comparison report dict (raises on contract violation)."""
    import jax.numpy as jnp

    from viettts_tpu.config import Config
    from viettts_tpu.models import AcousticModel, DurationModel, Generator
    from viettts_tpu.text import load_lexicon, normalize_text, text_to_tokens
    from viettts_tpu.train.checkpoint import load_variables

    ref = load_reference(reference)
    if ref is None:
        raise SystemExit(f"reference checkout not found at {reference}")
    neutralize_stochastic(ref)

    lexicon_path = reference / "assets" / "infore" / "lexicon.txt"
    norm = normalize_text(text)

    # token parity
    ref_tokens = list(ref.text2mel.text2tokens(norm, lexicon_path))
    my_tokens = text_to_tokens(norm, load_lexicon(lexicon_path))
    assert my_tokens == ref_tokens, "token mismatch vs reference frontend"
    T = len(my_tokens)

    # --- reference inference from the pretrained pickles ---
    ref.config.FLAGS.ckpt_dir = ckpt_dir
    if hasattr(ref.text2mel, "FLAGS"):
        ref.text2mel.FLAGS.ckpt_dir = ckpt_dir
    want_mel = np.asarray(
        ref.text2mel.text2mel(norm, lexicon_path, silence_duration)
    )[0]

    # --- ours from the same files ---
    cfg = Config()
    dvars = load_variables(ckpt_dir / "duration_latest_ckpt.pickle", "duration")
    avars = load_variables(ckpt_dir / "acoustic_latest_ckpt.pickle", "acoustic")
    from viettts_tpu.types import DurationBatch

    toks = jnp.asarray(np.asarray(my_tokens, np.int32)[None, :])
    lengths = jnp.asarray([T], jnp.int32)
    dur_s = np.asarray(
        DurationModel(cfg.duration).apply(
            dvars, DurationBatch(toks, lengths, None), train=False
        )
    )
    tok_row = np.asarray(my_tokens)[None, :]
    dur_s = np.where(
        tok_row == ref.config.FLAGS.sil_index,
        np.clip(dur_s, silence_duration, None),
        dur_s,
    )
    dur_s = np.where(tok_row == ref.config.FLAGS.word_end_index, 0.0, dur_s)
    fps = cfg.dsp.sample_rate / cfg.dsp.hop_length
    dur_frames = dur_s * fps
    n_frames = int(dur_frames.sum())
    acfg = dataclasses.replace(cfg.acoustic, prenet_dropout_at_inference=False)
    mel = np.asarray(
        AcousticModel(acfg).apply(
            avars, toks, jnp.asarray(dur_frames), n_frames, lengths,
            method=AcousticModel.inference,
        )
    )[0]
    trim = int(dur_s[0, -1] * fps) if my_tokens[-1] == ref.config.FLAGS.sil_index else 0
    if trim:
        mel = mel[:-trim]
    assert mel.shape == want_mel.shape, (mel.shape, want_mel.shape)
    mel_err = float(np.abs(mel - want_mel).max())
    mel_mean_err = float(np.abs(mel - want_mel).mean())

    # --- vocoder on the same (reference) mel from the same weights ---
    import pickle as _pickle

    hvars = load_variables(ckpt_dir / "hifigan_latest_ckpt.pickle", "hifigan")
    our_wave = np.asarray(
        Generator(cfg.hifigan).apply(
            hvars, jnp.asarray(want_mel)[None]
        )
    )[0, :, 0]

    # reference generator: haiku forward from its converted pickle
    # (mel2wave.py:20-41 without the hardcoded relative config path)
    hk = ref.hk
    ref_pickle = ckpt_dir / "hk_hifi.pickle"
    if ref_pickle.exists():
        with open(ref_pickle, "rb") as f:
            ref_params = _pickle.load(f)

        class AttrDict(dict):
            __getattr__ = dict.__getitem__

        config_json = json.loads(
            (reference / "assets" / "hifigan" / "config.json").read_text()
        )
        h = AttrDict(config_json)

        def fwd(mel_in):
            net = ref.hifigan_model.Generator(h)
            return net(mel_in)

        forward = hk.transform(fwd)
        want_wave = np.asarray(
            forward.apply(ref_params, None, jnp.asarray(want_mel)[None])
        )[0, :, 0]
        wave_err = float(np.abs(our_wave - want_wave).max())
    else:
        want_wave = None
        wave_err = None

    report = {
        "text": text,
        "tokens": T,
        "mel_frames": int(mel.shape[0]),
        "mel_max_err": mel_err,
        "mel_mean_err": mel_mean_err,
        "wave_max_err": wave_err,
        "mel_ok": mel_err <= 1e-3,
        "wave_ok": (wave_err is None) or (wave_err <= 1e-3),
    }
    return report


def main(argv=None):
    from argparse import ArgumentParser

    p = ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ckpt-dir", type=Path, default=REPO / "assets/infore/nat")
    p.add_argument("--reference", type=Path, default=Path("/root/reference"))
    p.add_argument("--text", default=DEMO_TEXT)
    p.add_argument("--silence-duration", type=float, default=0.2)
    p.add_argument("--update-lock", action="store_true")
    p.add_argument(
        "--no-download", action="store_true",
        help="use pre-placed files only (offline)",
    )
    args = p.parse_args(argv)

    if not args.no_download:
        ensure_files(args.ckpt_dir, update_lock=args.update_lock)
    missing = [n for n in FILES if not (args.ckpt_dir / n).exists()]
    if missing:
        raise SystemExit(f"missing checkpoint files: {missing}")

    # convert the torch vocoder for our pipeline (and produce the
    # reference's own hk_hifi.pickle for the wave comparison if the
    # reference converter's output is absent)
    native_voc = args.ckpt_dir / "hifigan_latest_ckpt.pickle"
    if not native_voc.exists():
        from viettts_tpu.tools.convert_torch_hifigan import convert_file

        convert_file(args.ckpt_dir / "g_01140000", native_voc)
        print(f"converted vocoder -> {native_voc}", file=sys.stderr)

    report = compare(
        args.ckpt_dir, args.reference, args.text, args.silence_duration
    )
    print(json.dumps(report))
    return 0 if report["mel_ok"] and report["wave_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
