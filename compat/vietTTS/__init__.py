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
"""
