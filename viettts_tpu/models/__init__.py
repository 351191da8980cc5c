from viettts_tpu.models.acoustic import AcousticModel
from viettts_tpu.models.duration import DurationModel
from viettts_tpu.models.encoder import TokenEncoder
from viettts_tpu.models.hifigan import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)

__all__ = [
    "TokenEncoder",
    "DurationModel",
    "AcousticModel",
    "Generator",
    "MultiPeriodDiscriminator",
    "MultiScaleDiscriminator",
]
