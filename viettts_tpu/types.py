"""Batch interchange types.

These mirror the reference NamedTuples (config.py:62-74) so the data layer,
losses and models share a stable contract, but carry jax.Array leaves and are
registered pytrees via NamedTuple semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax


class DurationBatch(NamedTuple):
    """A batch for the duration model.

    phonemes:  [B, L] int32 token ids.
    lengths:   [B]    int32 true sequence lengths.
    durations: [B, L] float32 per-phoneme durations in seconds (None at
               inference).
    """

    phonemes: jax.Array
    lengths: jax.Array
    durations: Optional[jax.Array]


class AcousticBatch(NamedTuple):
    """A batch for the acoustic model.

    phonemes:    [B, L]  int32 token ids.
    lengths:     [B]     int32 true phoneme sequence lengths.
    durations:   [B, L]  float32 durations (seconds from the loader; the
                 trainer converts to frames before the model sees them).
    wavs:        [B, S]  int16 waveforms (silence-zeroed, padded).
    wav_lengths: [B]     int32 true waveform lengths in samples.
    mels:        [B, T, D] float32 log-mel input frames (None until the
                 trainer computes them on-device).
    """

    phonemes: jax.Array
    lengths: jax.Array
    durations: jax.Array
    wavs: jax.Array
    wav_lengths: jax.Array
    mels: Optional[jax.Array]
