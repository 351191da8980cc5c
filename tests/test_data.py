"""Data layer tests: TextGrid parsing, alignment walking, loaders, WAV IO."""

import numpy as np
import pytest

from viettts_tpu.data.audio import read_wav, write_wav
from viettts_tpu.data.loader import (
    AcousticDataset,
    DurationDataset,
    split_files,
)
from viettts_tpu.data.textgrid import load_alignment, parse_textgrid

LONG_TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.2
            text = ""
        intervals [2]:
            xmin = 0.2
            xmax = 0.7
            text = "ba"
        intervals [3]:
            xmin = 0.7
            xmax = 1.0
            text = ""
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.2
            text = "sil"
        intervals [2]:
            xmin = 0.2
            xmax = 0.45
            text = "b"
        intervals [3]:
            xmin = 0.45
            xmax = 0.7
            text = "a"
        intervals [4]:
            xmin = 0.7
            xmax = 1.0
            text = ""
"""

SHORT_TG = """File type = "ooTextFile"
Object class = "TextGrid"

0
1.0
<exists>
2
"IntervalTier"
"words"
0
1.0
3
0
0.2
""
0.2
0.7
"ba"
0.7
1.0
""
"IntervalTier"
"phones"
0
1.0
4
0
0.2
"sil"
0.2
0.45
"b"
0.45
0.7
"a"
0.7
1.0
""
"""


def test_parse_long_format():
    tiers = parse_textgrid(LONG_TG)
    assert len(tiers) == 2
    assert tiers[0].name == "words"
    assert len(tiers[0].intervals) == 3
    assert tiers[0].intervals[1].text == "ba"
    assert tiers[1].intervals[1].xmin == pytest.approx(0.2)


def test_parse_short_format():
    long_t = parse_textgrid(LONG_TG)
    short_t = parse_textgrid(SHORT_TG)
    assert long_t == short_t


def _write_corpus(tmp_path, n_files=4, sr=16000):
    for i in range(n_files):
        (tmp_path / f"utt{i}.TextGrid").write_text(LONG_TG, encoding="utf-8")
        wav = (np.random.RandomState(i).randn(sr) * 3000).astype(np.int16)
        write_wav(tmp_path / f"utt{i}.wav", wav, sr)
    return tmp_path


def test_load_alignment_word_end_insertion(tmp_path):
    p = tmp_path / "a.TextGrid"
    p.write_text(LONG_TG, encoding="utf-8")
    pairs = load_alignment(p)
    # sil, b, a, <word-end>, sil  — word-end after the non-empty word "ba"
    assert [x[0] for x in pairs] == ["sil", "b", "a", " ", "sil"]
    assert pairs[0][1] == pytest.approx(0.2)
    assert pairs[3][1] == 0.0
    # durations of real phones sum to the full file
    assert sum(d for _, d in pairs) == pytest.approx(1.0)


def test_split_files_deterministic(tmp_path):
    _write_corpus(tmp_path, 10)
    train1 = split_files(tmp_path, "train")
    train2 = split_files(tmp_path, "train")
    val = split_files(tmp_path, "val")
    assert train1 == train2
    assert len(train1) + len(val) == 10
    assert not (set(train1) & set(val))
    assert len(split_files(tmp_path, "gta")) == 10


def test_duration_dataset_batches(tmp_path):
    _write_corpus(tmp_path, 5)
    ds = DurationDataset(tmp_path, seq_len=16, mode="gta")
    assert len(ds) == 5
    batch = next(ds.batches(2))
    assert batch.phonemes.shape == (2, 16)
    assert batch.durations.shape == (2, 16)
    assert batch.lengths.shape == (2,)
    assert batch.lengths[0] == 5  # sil b a <we> sil


def test_acoustic_dataset_silence_zeroing(tmp_path):
    sr = 16000
    _write_corpus(tmp_path, 3, sr)
    ds = AcousticDataset(tmp_path, seq_len=16, pad_wav_len=2 * sr, mode="gta")
    # first 0.2 s is sil -> zeroed; 0.2..0.7 is b/a -> non-zero
    wav = ds.wavs[0]
    assert np.all(wav[: int(0.2 * sr)] == 0)
    assert np.any(wav[int(0.3 * sr) : int(0.6 * sr)] != 0)
    # trailing sil zeroed through the padded region
    assert np.all(wav[int(0.72 * sr) :] == 0)
    assert ds.wav_lengths[0] == sr

    batch = next(ds.batches(2))
    assert batch.wavs.shape == (2, 2 * sr)
    assert batch.mels is None


def test_gta_batches_cover_all_once(tmp_path):
    _write_corpus(tmp_path, 5)
    ds = AcousticDataset(tmp_path, seq_len=16, pad_wav_len=32000, mode="gta")
    seen = []
    for names, batch in ds.gta_batches(batch_size=2):
        assert batch.phonemes.shape[0] == len(names)
        seen.extend(names)
    assert sorted(seen) == sorted(ds.names)
    assert len(seen) == 5  # incl. final partial batch


def test_wav_roundtrip(tmp_path):
    sr = 16000
    data = (np.sin(np.linspace(0, 100, sr)) * 20000).astype(np.int16)
    path = tmp_path / "x.wav"
    write_wav(path, data, sr)
    sr2, back = read_wav(path)
    assert sr2 == sr
    np.testing.assert_array_equal(back, data)
    # float input round trip
    write_wav(path, data.astype(np.float32) / 32767.0, sr)
    _, back2 = read_wav(path)
    assert np.abs(back2.astype(np.int32) - data.astype(np.int32)).max() <= 1
