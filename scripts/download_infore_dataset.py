"""Download the MFA-aligned InfoRe Vietnamese speech corpus.

Equivalent of the reference's
``scripts/download_aligned_infore_dataset.py`` (pooch-downloads the
denoised 16 kHz wavs + MFA TextGrids from the HuggingFace hub and unpacks
matched pairs into ``train_data/``).  Network access is required; in
offline environments point ``--from-archives`` at pre-downloaded files.
"""

from __future__ import annotations

import shutil
import tarfile
import zipfile
from pathlib import Path

WAV_URL = (
    "https://huggingface.co/datasets/ntt123/infore/resolve/main/"
    "infore_16k_denoised.zip"
)
TG_URL = (
    "https://huggingface.co/datasets/ntt123/infore/resolve/main/"
    "infore_textgrids_v2.tar.gz"
)


def _download(url: str, dest: Path) -> Path:
    import urllib.request

    dest.parent.mkdir(parents=True, exist_ok=True)
    if not dest.exists():
        print("downloading", url)
        urllib.request.urlretrieve(url, dest)
    return dest


def _extract(archive: Path, out: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    if archive.suffix == ".zip":
        with zipfile.ZipFile(archive) as z:
            z.extractall(out)
    else:
        with tarfile.open(archive) as t:
            t.extractall(out)


def main(argv=None):
    from argparse import ArgumentParser

    parser = ArgumentParser(description="Fetch the aligned InfoRe corpus")
    parser.add_argument("-o", "--output-dir", type=Path, default=Path("train_data"))
    parser.add_argument("--cache-dir", type=Path, default=Path(".cache"))
    parser.add_argument(
        "--from-archives", type=Path, nargs=2, default=None,
        metavar=("WAV_ZIP", "TEXTGRID_TAR"),
        help="use local archives instead of downloading",
    )
    args = parser.parse_args(argv)

    if args.from_archives:
        wav_arc, tg_arc = args.from_archives
    else:
        wav_arc = _download(WAV_URL, args.cache_dir / "infore_16k_denoised.zip")
        tg_arc = _download(TG_URL, args.cache_dir / "infore_textgrids_v2.tar.gz")

    tmp = args.cache_dir / "extracted"
    _extract(Path(wav_arc), tmp / "wav")
    _extract(Path(tg_arc), tmp / "tg")

    wavs = {p.stem: p for p in (tmp / "wav").rglob("*.wav")}
    tgs = {p.stem: p for p in (tmp / "tg").rglob("*.TextGrid")}
    args.output_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for stem, tg in sorted(tgs.items()):
        wav = wavs.get(stem)
        if wav is None:
            continue
        shutil.copy(tg, args.output_dir / tg.name)
        shutil.copy(wav, args.output_dir / wav.name)
        n += 1
    print(f"prepared {n} aligned utterance pairs in {args.output_dir}")


if __name__ == "__main__":
    main()
