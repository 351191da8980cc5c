from viettts_tpu.ops.mel import LogMelSpectrogram, mel_filterbank, stft_magnitude
from viettts_tpu.ops.rnn import (
    LSTMParams,
    LSTMState,
    init_lstm,
    lstm_cell,
    unroll_lstm,
)

__all__ = [
    "LogMelSpectrogram",
    "mel_filterbank",
    "stft_magnitude",
    "LSTMParams",
    "LSTMState",
    "init_lstm",
    "lstm_cell",
    "unroll_lstm",
]
