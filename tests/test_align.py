"""tools/align.py: MFA corpus assembly, lexicon build, and the (mocked)
aligner invocation — the runnable equivalent of the reference's
align_text_audio_infore_mfa.ipynb cells 3-9."""

import wave as wave_mod

import numpy as np
import pytest

from viettts_tpu.tools import align


def _write_wav(path, seconds=0.1, sr=16000):
    pcm = (np.zeros(int(sr * seconds))).astype("<i2")
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture
def raw_corpus(tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    _write_wav(d / "utt1.wav")
    (d / "utt1.txt").write_text("Xin chào, thế giới!", encoding="utf-8")
    _write_wav(d / "utt2.wav")
    (d / "utt2.lab").write_text("một hai ba", encoding="utf-8")
    _write_wav(d / "orphan.wav")  # no transcript -> skipped
    return d


def test_assemble_corpus_and_lexicon(raw_corpus, tmp_path, capsys):
    out = tmp_path / "train_data"
    work = tmp_path / "work"
    rc = align.main([
        "-i", str(raw_corpus), "-o", str(out),
        "--work-dir", str(work), "--skip-mfa",
    ])
    assert rc == 0
    corpus = work / "corpus"
    # paired utterances only, transcripts normalized, no sil markers
    assert sorted(p.name for p in corpus.glob("*.wav")) == [
        "utt1.wav", "utt2.wav"
    ]
    lab = (corpus / "utt1.lab").read_text(encoding="utf-8")
    assert lab == "xin chào thế giới"
    # char lexicon covers every transcript word
    lex = dict(
        line.split("\t")
        for line in (work / "lexicon.txt").read_text(
            encoding="utf-8"
        ).splitlines()
    )
    assert lex["chào"] == "c h à o"
    assert "một" in lex and "giới" in lex


def test_run_mfa_command_and_collection(raw_corpus, tmp_path, monkeypatch):
    out = tmp_path / "train_data"
    work = tmp_path / "work"
    calls = []

    def fake_run(cmd, check):
        calls.append(cmd)
        # fake MFA output: one TextGrid nested one dir deep (per-speaker
        # layout) and one at top level
        tg_dir = work / "textgrids"
        (tg_dir / "speaker").mkdir(parents=True)
        (tg_dir / "utt1.TextGrid").write_text("tg1")
        (tg_dir / "speaker" / "utt2.TextGrid").write_text("tg2")

    monkeypatch.setattr(align.subprocess, "run", fake_run)
    rc = align.main([
        "-i", str(raw_corpus), "-o", str(out), "--work-dir", str(work),
        "--num-jobs", "2",
    ])
    assert rc == 0
    (cmd,) = calls
    assert cmd[:3] == ["mfa", "train", "--clean"]
    assert cmd[3:5] == ["-j", "2"]
    assert cmd[5:] == [
        str(work / "corpus"), str(work / "lexicon.txt"),
        str(work / "textgrids"),
    ]
    # TextGrids (both layouts) + wavs land in the output dir
    assert sorted(p.name for p in out.iterdir()) == [
        "utt1.TextGrid", "utt1.wav", "utt2.TextGrid", "utt2.wav"
    ]


def test_run_mfa_align_mode(raw_corpus, tmp_path, monkeypatch):
    work = tmp_path / "work"
    out = tmp_path / "out"
    calls = []
    monkeypatch.setattr(
        align.subprocess, "run", lambda cmd, check: calls.append(cmd)
    )
    align.main([
        "-i", str(raw_corpus), "-o", str(out), "--work-dir", str(work),
        "--acoustic-model", "vietnamese_mfa",
    ])
    (cmd,) = calls
    assert cmd[:3] == ["mfa", "align", "--clean"]
    assert "vietnamese_mfa" in cmd


def test_missing_mfa_binary_message(raw_corpus, tmp_path):
    work = tmp_path / "work"
    with pytest.raises(SystemExit, match="not found"):
        align.main([
            "-i", str(raw_corpus), "-o", str(tmp_path / "o"),
            "--work-dir", str(work),
            "--mfa-binary", str(tmp_path / "definitely-not-mfa"),
        ])
