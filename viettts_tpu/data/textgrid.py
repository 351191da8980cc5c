"""Native Praat TextGrid parser (long and short text formats).

The reference depends on the third-party ``textgrid`` package
(/root/reference/vietTTS/nat/data_loader.py:5,30); this is a first-party
parser covering the MFA-produced files the pipeline consumes: interval
tiers with (xmin, xmax, text).

``load_alignment`` reproduces the reference's phoneme/word walk
(data_loader.py:28-47): it emits (phoneme, duration_seconds) pairs from the
phones tier, inserts a zero-duration word-end token at every word boundary
(only after non-empty words), and relabels empty phone marks as ``sil``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path
from typing import List, Tuple

from viettts_tpu.config import SPECIAL_PHONEMES, WORD_END_INDEX

_WORD_END = SPECIAL_PHONEMES[WORD_END_INDEX]


@dataclass(frozen=True)
class Interval:
    xmin: float
    xmax: float
    text: str

    @property
    def duration(self) -> float:
        return self.xmax - self.xmin


@dataclass(frozen=True)
class Tier:
    name: str
    intervals: Tuple[Interval, ...]


_QUOTED = re.compile(r'"((?:[^"]|"")*)"')
_NUMBER = re.compile(r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?")


def _unquote(s: str) -> str:
    return s.replace('""', '"')


def parse_textgrid(text: str) -> List[Tier]:
    """Parse a TextGrid document into interval tiers.

    Handles both the long ("item [1]: ... intervals [1]:") and short
    (bare values, one per line) text formats by scanning tokens rather than
    relying on indentation.
    """
    # Long-format structural index lines ("item [1]:", "intervals [7]:")
    # carry numbers that are not data — drop them before tokenizing.
    text = re.sub(
        r"^\s*(item|intervals|points)\s*\[\d*\]\s*:\s*$",
        "",
        text,
        flags=re.MULTILINE,
    )
    # Tokenize into a stream of quoted strings and numbers, then interpret
    # it according to the declared tier structure.
    tokens: List[Tuple[str, str]] = []  # (kind, value)
    for m in re.finditer(r'"(?:[^"]|"")*"|-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?', text):
        tok = m.group(0)
        if tok.startswith('"'):
            tokens.append(("str", _unquote(tok[1:-1])))
        else:
            tokens.append(("num", tok))

    pos = 0

    def next_str() -> str:
        nonlocal pos
        while pos < len(tokens) and tokens[pos][0] != "str":
            pos += 1
        if pos >= len(tokens):
            raise ValueError("unexpected end of TextGrid")
        val = tokens[pos][1]
        pos += 1
        return val

    def next_num() -> float:
        nonlocal pos
        while pos < len(tokens) and tokens[pos][0] != "num":
            pos += 1
        if pos >= len(tokens):
            raise ValueError("unexpected end of TextGrid")
        val = float(tokens[pos][1])
        pos += 1
        return val

    ftype = next_str()  # "ooTextFile"
    oclass = next_str()  # "TextGrid"
    if "TextGrid" not in oclass and "TextGrid" not in ftype:
        raise ValueError("not a TextGrid file")
    _xmin = next_num()
    _xmax = next_num()
    # <exists> flag is not numeric/quoted in short form ("<exists>"), and in
    # long form the line is "tiers? <exists>"; neither tokenizes, fine.
    size = int(next_num())

    tiers: List[Tier] = []
    for _ in range(size):
        tclass = next_str()  # "IntervalTier" / "TextTier"
        name = next_str()
        t_xmin = next_num()
        t_xmax = next_num()
        n = int(next_num())
        intervals = []
        if tclass == "IntervalTier":
            for _i in range(n):
                xmin = next_num()
                xmax = next_num()
                mark = next_str()
                intervals.append(Interval(xmin, xmax, mark))
        else:  # point tier: (time, mark)
            for _i in range(n):
                t = next_num()
                mark = next_str()
                intervals.append(Interval(t, t, mark))
        tiers.append(Tier(name=name, intervals=tuple(intervals)))
    return tiers


def read_textgrid(path: str | Path) -> List[Tier]:
    raw = Path(path).read_bytes()
    for enc in ("utf-8", "utf-16"):
        try:
            return parse_textgrid(raw.decode(enc))
        except UnicodeDecodeError:
            continue
    raise ValueError(f"cannot decode TextGrid file {path}")


def _phone_in_word(phone: Interval, word: Interval, tol: float = 1e-3) -> bool:
    """Phone lies inside the word interval (with tolerance, reference
    data_loader.py:21-25)."""
    return (
        word.xmin - tol < phone.xmin
        and phone.xmin < word.xmax + tol
        and word.xmin - tol < phone.xmax
        and phone.xmax < word.xmax + tol
    )


def load_alignment(path: str | Path) -> List[Tuple[str, float]]:
    """MFA TextGrid -> [(phoneme, duration_seconds)] with word-end markers.

    Tier 0 must be words, tier 1 phones — the MFA convention the reference
    assumes (data_loader.py:32-35).
    """
    tiers = read_textgrid(path)
    if len(tiers) < 2:
        raise ValueError(f"expected words+phones tiers in {path}")
    words = list(tiers[0].intervals)
    phones = list(tiers[1].intervals)
    if not phones or abs(phones[0].xmin) > 1e-6:
        raise ValueError("The first phoneme has to start at time 0")

    data: List[Tuple[str, float]] = []
    widx = 0
    for p in phones:
        if not _phone_in_word(p, words[widx]):
            widx += 1
            if len(words[widx - 1].text.strip()) > 0:
                data.append((_WORD_END, 0.0))
            if widx >= len(words):
                break
            if not _phone_in_word(p, words[widx]):
                raise ValueError(f"mismatched word vs phoneme in {path}")
        mark = p.text.strip().lower()
        if len(mark) == 0:
            mark = "sil"
        data.append((mark, p.duration))
    return data
