"""GTA (ground-truth-aligned) mel export for vocoder finetuning.

Equivalent of ``python -m vietTTS.nat.gta`` (reference gta.py:28-82): run
the teacher-forced acoustic model in eval mode over the *entire* corpus and
save each utterance's predicted (post-postnet) mel as ``<name>.npy`` with
shape [mel_dim, T] trimmed to the true frame count.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import numpy as np

import jax

from viettts_tpu.config import Config
from viettts_tpu.data.loader import AcousticDataset
from viettts_tpu.models import AcousticModel
from viettts_tpu.ops.mel import LogMelSpectrogram
from viettts_tpu.train.acoustic import prepare_batch
from viettts_tpu.train.checkpoint import load_variables


def generate_gta(
    out_dir: Path, cfg: Config = Config(), acoustic_ckpt=None
) -> int:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    hop = cfg.dsp.hop_length
    model = AcousticModel(cfg.acoustic)
    mel_fn = LogMelSpectrogram(cfg.dsp)
    ckpt = acoustic_ckpt or Path(cfg.ckpt_dir) / "acoustic_latest_ckpt.pickle"
    variables = load_variables(ckpt, "acoustic")

    @partial(jax.jit)
    def forward(batch, rng):
        model_batch, _ = prepare_batch(batch, mel_fn, hop)
        rngs = dict(
            zip(("dropout", "prenet", "zoneout"), jax.random.split(rng, 3))
        )
        (mel1, mel2), _ = model.apply(
            variables, model_batch, train=False, rngs=rngs,
            mutable=["intermediates"],
        )
        return mel2

    ds = AcousticDataset(
        cfg.data_dir,
        cfg.data.max_phoneme_seq_len,
        cfg.data.max_wave_len,
        "gta",
        cfg.data,
        cfg.dsp.sample_rate,
    )
    rng = jax.random.PRNGKey(42)
    count = 0
    for names, batch in ds.gta_batches(cfg.train.batch_size):
        mel = np.asarray(forward(batch, rng))
        for i, name in enumerate(names):
            n_frames = int(batch.wav_lengths[i]) // hop
            np.save(out_dir / f"{name}.npy", mel[i, :n_frames].T)
            count += 1
    return count


def main(argv=None):
    from argparse import ArgumentParser

    from viettts_tpu.config import apply_overrides

    parser = ArgumentParser(description="Export GTA mels for vocoder finetune")
    parser.add_argument("-o", "--output-dir", type=Path, default=Path("gta"))
    parser.add_argument("--data-dir", type=Path, default=None)
    parser.add_argument("--ckpt-dir", type=Path, default=None)
    parser.add_argument("--set", action="append", default=[], metavar="K=V")
    args = parser.parse_args(argv)
    cfg = apply_overrides(Config(), args.set)
    if args.data_dir:
        cfg = cfg.replace(data_dir=args.data_dir)
    if args.ckpt_dir:
        cfg = cfg.replace(ckpt_dir=args.ckpt_dir)
    n = generate_gta(args.output_dir, cfg)
    print(f"wrote {n} GTA mel files to {args.output_dir}")


if __name__ == "__main__":
    main()
