"""Drop-in ``vietTTS`` import-path shim over viettts_tpu.

Lets code written against the reference (NTT123/vietTTS) run unchanged:

    from vietTTS.nat.text2mel import text2mel
    from vietTTS.hifigan.mel2wave import mel2wave
    python -m vietTTS.synthesizer --text "..." --output clip.wav

The implementations are viettts_tpu's (cached models, bucketed shapes,
Pallas serving kernels) — only the import paths and signatures match the
reference (/root/reference/vietTTS).

This package lives under ``compat/`` so the repository checkout itself
never shadows a real reference checkout (the parity tests import the
genuine package from its own tree); it becomes importable when
viettts_tpu is installed with pip, via the package-dir mapping in
pyproject.toml.

Every shim entry point serves through ``PARITY_CFG`` — the default
config with ``hifigan.inference_dtype=float32``.  The drop-in surface
promises reference parity (``<=1e-3`` waveform agreement, BASELINE.json),
which even the bf16 serving default (0.57% rel-RMS on trained weights,
benchmarks/int8_quality.json) would silently break for a reference user
who never opted in.  bf16 remains the default for the viettts_tpu-native
CLI/API, where it is an advertised serving choice with a measured
quality bound.
"""

from viettts_tpu.config import DEFAULT_CONFIG, apply_overrides

#: Reference-parity serving config: float32 vocoder route.
PARITY_CFG = apply_overrides(
    DEFAULT_CONFIG, ["hifigan.inference_dtype=float32"]
)

__all__ = ["PARITY_CFG"]
