"""Dataset loading and batching for MFA-aligned TextGrid + WAV corpora.

Behavioural parity with the reference loaders
(/root/reference/vietTTS/nat/data_loader.py:50-156): deterministic
shuffle (seed 42), 95/5 train/val split over sorted file lists, padded
fixed-shape batches (static shapes keep XLA from recompiling), waveform
zeroing inside special-phoneme segments, and a single-pass named "gta"
mode with a partial final batch.

TPU-first additions: the whole corpus is packed into contiguous numpy
arrays up front (no per-batch python object shuffling), batches are sampled
by index, and ``device_prefetch`` keeps one batch in flight so host->HBM
transfer overlaps the previous step.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from viettts_tpu.config import ALL_PHONEMES, DataConfig, SPECIAL_PHONEMES
from viettts_tpu.data.audio import read_wav
from viettts_tpu.data.textgrid import load_alignment
from viettts_tpu.types import AcousticBatch, DurationBatch

_PHONEME_TO_ID = {p: i for i, p in enumerate(ALL_PHONEMES)}
_NUM_SPECIAL = len(SPECIAL_PHONEMES)


def split_files(
    data_dir: Path, mode: str, cfg: DataConfig = DataConfig()
) -> List[Path]:
    """Deterministic train/val split over the corpus TextGrids."""
    tg_files = sorted(Path(data_dir).glob("*.TextGrid"))
    random.Random(cfg.shuffle_seed).shuffle(tg_files)
    n_train = int(len(tg_files) * cfg.train_split)
    if mode == "train":
        return tg_files[:n_train]
    if mode == "val":
        return tg_files[n_train:]
    if mode == "gta":
        return tg_files
    raise ValueError(f"unknown mode {mode!r}")


def _load_tokens(
    fn: Path, seq_len: int
) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Parse one TextGrid -> (padded ids [L], padded durations [L], length)."""
    pairs = load_alignment(fn)
    if len(pairs) > seq_len:
        return None
    ids = np.zeros((seq_len,), np.int32)
    durs = np.zeros((seq_len,), np.float32)
    for i, (ph, d) in enumerate(pairs):
        ids[i] = _PHONEME_TO_ID[ph]
        durs[i] = d
    return ids, durs, len(pairs)


class DurationDataset:
    """All alignments in RAM as packed arrays; infinite shuffled batches."""

    def __init__(self, data_dir: Path, seq_len: int, mode: str,
                 cfg: DataConfig = DataConfig()):
        files = split_files(data_dir, mode, cfg)
        rows = [r for r in (_load_tokens(f, seq_len) for f in files) if r]
        if not rows:
            raise ValueError(f"no usable TextGrids in {data_dir} ({mode})")
        self.phonemes = np.stack([r[0] for r in rows])
        self.durations = np.stack([r[1] for r in rows])
        self.lengths = np.array([r[2] for r in rows], np.int32)

    def __len__(self) -> int:
        return len(self.lengths)

    def batches(self, batch_size: int, seed: int = 0) -> Iterator[DurationBatch]:
        rng = np.random.RandomState(seed)
        n = len(self)
        if batch_size > n:
            raise ValueError(f"batch_size {batch_size} > dataset size {n}")
        while True:
            order = rng.permutation(n)
            for s in range(0, n - batch_size + 1, batch_size):
                idx = order[s : s + batch_size]
                yield DurationBatch(
                    phonemes=self.phonemes[idx],
                    lengths=self.lengths[idx],
                    durations=self.durations[idx],
                )


def _zero_special_segments(
    wav: np.ndarray,
    ids: np.ndarray,
    durs: np.ndarray,
    length: int,
    sample_rate: int,
) -> np.ndarray:
    """Zero waveform samples inside special-phoneme (sil/sp/spn/word-end)
    segments so the model never learns breath/noise in silence (reference
    data_loader.py:112-121)."""
    wav = np.array(wav, copy=True)
    t = 0.0
    n = len(ids)
    for i in range(n):
        left = int(t * sample_rate)
        t_end = t + float(durs[i])
        right = int(t_end * sample_rate)
        if i == n - 1:
            right = len(wav)
        if ids[i] < _NUM_SPECIAL:
            wav[left:right] = 0
        t = t_end
    return wav


class AcousticDataset:
    """Alignments + silence-zeroed waveforms in RAM as packed arrays."""

    def __init__(
        self,
        data_dir: Path,
        seq_len: int,
        pad_wav_len: int,
        mode: str,
        cfg: DataConfig = DataConfig(),
        sample_rate: int = 16000,
    ):
        files = split_files(data_dir, mode, cfg)
        names: List[str] = []
        tok_rows, wav_rows, wav_lens = [], [], []
        for fn in files:
            row = _load_tokens(fn, seq_len)
            if row is None:
                continue
            wav_file = fn.with_suffix(".wav")
            if not wav_file.exists():
                continue
            sr, y = read_wav(wav_file)
            if y.ndim > 1:
                y = y[:, 0]
            y = y.astype(np.int16)
            ids, durs, length = row
            y = _zero_special_segments(y, ids, durs, length, sr)
            if len(y) > pad_wav_len:
                y = y[:pad_wav_len]
            wav_len = len(y)
            y = np.pad(y, (0, pad_wav_len - len(y)))
            names.append(fn.stem)
            tok_rows.append(row)
            wav_rows.append(y)
            wav_lens.append(wav_len)
        if not tok_rows:
            raise ValueError(f"no usable utterances in {data_dir} ({mode})")
        self.names = names
        self.phonemes = np.stack([r[0] for r in tok_rows])
        self.durations = np.stack([r[1] for r in tok_rows])
        self.lengths = np.array([r[2] for r in tok_rows], np.int32)
        self.wavs = np.stack(wav_rows)
        self.wav_lengths = np.array(wav_lens, np.int32)

    def __len__(self) -> int:
        return len(self.lengths)

    def _make_batch(self, idx: np.ndarray) -> AcousticBatch:
        return AcousticBatch(
            phonemes=self.phonemes[idx],
            lengths=self.lengths[idx],
            durations=self.durations[idx],
            wavs=self.wavs[idx],
            wav_lengths=self.wav_lengths[idx],
            mels=None,
        )

    def batches(self, batch_size: int, seed: int = 0) -> Iterator[AcousticBatch]:
        rng = np.random.RandomState(seed)
        n = len(self)
        if batch_size > n:
            raise ValueError(f"batch_size {batch_size} > dataset size {n}")
        while True:
            order = rng.permutation(n)
            for s in range(0, n - batch_size + 1, batch_size):
                yield self._make_batch(order[s : s + batch_size])

    def gta_batches(
        self, batch_size: int
    ) -> Iterator[Tuple[List[str], AcousticBatch]]:
        """One deterministic pass over every utterance, names attached,
        final batch possibly partial (reference data_loader.py:142-156)."""
        n = len(self)
        for s in range(0, n, batch_size):
            idx = np.arange(s, min(s + batch_size, n))
            yield [self.names[i] for i in idx], self._make_batch(idx)


def device_prefetch(it: Iterator, size: int = 2) -> Iterator:
    """Keep ``size`` batches in flight on-device so host->HBM transfer
    overlaps compute (replaces the reference's synchronous per-step
    host->device transfer)."""
    import collections

    import jax

    queue = collections.deque()
    for batch in it:
        queue.append(jax.device_put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
