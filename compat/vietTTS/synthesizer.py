"""Reference-compatible CLI and text normalization
(/root/reference/vietTTS/synthesizer.py:12-39).

``python -m vietTTS.synthesizer --text ... --output ...`` behaves like the
reference command, running viettts_tpu's cached/bucketed pipeline.
"""

from viettts_tpu.synthesizer import main
from viettts_tpu.text import normalize_text as nat_normalize_text

__all__ = ["main", "nat_normalize_text"]

if __name__ == "__main__":
    import sys

    sys.exit(main())
