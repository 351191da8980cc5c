"""Synthesis CLI — drop-in equivalent of ``python -m vietTTS.synthesizer``
(reference synthesizer.py:12-39) with the same flags, plus batch mode.

Usage:
    python -m viettts_tpu.synthesizer --text "xin chào" --output clip.wav
    python -m viettts_tpu.synthesizer --text-file lines.txt --output-dir out/
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path


def main(argv=None, default_overrides=()):
    """``default_overrides``: config overrides applied before ``--set`` /
    ``--quality`` (so explicit flags win) — used by the ``vietTTS`` compat
    shim to default its parity surface to the float32 vocoder route."""
    parser = ArgumentParser(description="TPU-native Vietnamese TTS")
    parser.add_argument("--text", type=str, help="text to synthesize")
    parser.add_argument(
        "--text-file", type=Path,
        help="file with one utterance per line (batch mode)",
    )
    parser.add_argument("--output", default=Path("clip.wav"), type=Path)
    parser.add_argument(
        "--output-dir", type=Path, help="output directory for batch mode"
    )
    parser.add_argument("--sample-rate", default=16000, type=int)
    parser.add_argument("--silence-duration", default=-1, type=float)
    parser.add_argument("--lexicon-file", default=None)
    parser.add_argument(
        "--save-mel", type=Path, default=None,
        help="also save the log-mel as .npy (and .png if matplotlib is "
        "available) — the reference's standalone text2mel output",
    )
    parser.add_argument(
        "--stream", action="store_true",
        help="write the wav progressively, one silence-bounded chunk at "
        "a time (Synthesizer.stream) — audio appears in the file while "
        "later chunks are still decoding",
    )
    parser.add_argument("--ckpt-dir", default=None, type=Path)
    parser.add_argument("--hifigan-ckpt", default=None, type=Path)
    parser.add_argument(
        "--quality", action="store_true",
        help="maximum-fidelity vocoder route (float32 everywhere) — the "
        "escape hatch from the default low-precision serving path; "
        "equivalent to --set hifigan.inference_dtype=float32",
    )
    parser.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="config override, e.g. --set dsp.sample_rate=16000",
    )
    args = parser.parse_args(argv)

    if not args.text and not args.text_file:
        parser.error("one of --text / --text-file is required")

    from viettts_tpu.config import Config, apply_overrides
    from viettts_tpu.data.audio import write_wav
    from viettts_tpu.infer.pipeline import Synthesizer
    from viettts_tpu.text import normalize_text

    cfg = apply_overrides(Config(), list(default_overrides) + args.set)
    if args.quality:
        cfg = apply_overrides(cfg, ["hifigan.inference_dtype=float32"])
    if args.ckpt_dir is not None:
        cfg = cfg.replace(ckpt_dir=args.ckpt_dir)

    synth = Synthesizer(
        cfg,
        hifigan_ckpt=args.hifigan_ckpt,
        lexicon_file=args.lexicon_file,
    )

    if args.text:
        text = normalize_text(args.text)
        print("Normalized text input:", text)
        if args.stream:
            import time
            import wave as wave_mod

            import numpy as np

            t0 = time.time()
            mels = []
            with wave_mod.open(str(args.output), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(args.sample_rate)
                for i, part in enumerate(
                    synth.stream(args.text, args.silence_duration)
                ):
                    pcm = (
                        np.clip(part.wave, -1.0, 1.0) * 32767.0
                    ).astype("<i2")
                    w.writeframes(pcm.tobytes())
                    mels.append(part.mel)
                    print(
                        f"chunk {i}: {len(part.wave) / args.sample_rate:.2f}s"
                        f" audio at t={time.time() - t0:.2f}s"
                    )
            print("wrote", args.output)
            result = None
            if args.save_mel is not None:
                from viettts_tpu.infer.pipeline import SynthesisResult

                result = SynthesisResult(
                    wave=np.zeros(0, np.float32),
                    mel=np.concatenate(mels, axis=0),
                    durations=np.zeros(0, np.float32),
                )
        else:
            result = synth.synthesize(args.text, args.silence_duration)
            print("writing output to file", args.output)
            write_wav(args.output, result.wave, args.sample_rate)
        if args.save_mel is not None:
            import numpy as np

            np.save(args.save_mel.with_suffix(".npy"), result.mel)
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                plt.figure(figsize=(10, 5))
                plt.imshow(result.mel.T, origin="lower", aspect="auto")
                plt.savefig(args.save_mel.with_suffix(".png"))
                plt.close()
            except Exception:
                pass
        return 0

    lines = [
        ln.strip() for ln in args.text_file.read_text().splitlines() if ln.strip()
    ]
    out_dir = args.output_dir or Path("synthesized")
    out_dir.mkdir(parents=True, exist_ok=True)
    results = synth.synthesize_batch(lines, args.silence_duration)
    for i, result in enumerate(results):
        out = out_dir / f"{i:04d}.wav"
        print("writing", out)
        write_wav(out, result.wave, args.sample_rate)
    return 0


if __name__ == "__main__":
    sys.exit(main())
