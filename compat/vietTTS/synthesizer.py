"""Reference-compatible CLI and text normalization
(/root/reference/vietTTS/synthesizer.py:12-39).

``python -m vietTTS.synthesizer --text ... --output ...`` behaves like the
reference command, running viettts_tpu's cached/bucketed pipeline — on the
float32 parity route by default (see vietTTS.PARITY_CFG; ``--set
hifigan.inference_dtype=bfloat16`` opts back into the fast route).
"""

import functools

from viettts_tpu.synthesizer import main as _main
from viettts_tpu.text import normalize_text as nat_normalize_text

main = functools.wraps(_main)(
    functools.partial(
        _main, default_overrides=("hifigan.inference_dtype=float32",)
    )
)

__all__ = ["main", "nat_normalize_text"]

if __name__ == "__main__":
    import sys

    sys.exit(main())
