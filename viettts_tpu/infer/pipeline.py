"""End-to-end synthesis pipeline: text -> tokens -> durations -> mel -> wave.

Functional parity with the reference inference path
(/root/reference/vietTTS/nat/text2mel.py:22-103 and
/root/reference/vietTTS/hifigan/mel2wave.py:20-41), redesigned for TPU
serving:

* Checkpoints are loaded **once** and jitted callables cached — the
  reference re-reads every pickle and re-jits on every call
  (text2mel.py:27,63; mel2wave.py:35).
* **Length bucketing**: token and frame lengths are padded up to a small
  set of bucket sizes, so XLA compiles a handful of program shapes instead
  of one per utterance (the reference passes ``n_frames`` as a static
  argument — a recompile for every new utterance length, text2mel.py:79-80).
* Batched synthesis: many utterances padded into one [B, T] batch, with
  padding tokens masked out of the Gaussian upsampler.
* Duration postprocessing (sil clamping, zero word-end durations, trailing
  silence trim) matches text2mel.py:90-102.
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from viettts_tpu.config import (
    Config,
    SIL_INDEX,
    WORD_END_INDEX,
)
from viettts_tpu.models import AcousticModel, DurationModel, Generator
from viettts_tpu.text import load_lexicon, normalize_text, text_to_tokens
from viettts_tpu.train.checkpoint import load_variables
from viettts_tpu.types import DurationBatch

logger = logging.getLogger(__name__)

DEFAULT_TOKEN_BUCKETS = (32, 64, 128, 192, 256, 384, 512)
FRAME_BUCKET = 128  # frames are padded to a multiple of this
# Static frame budget of the single-dispatch program: covers the ~4-8
# frames/token real Vietnamese speech produces (see ``warmup``); overflow
# is detected from the returned frame total and falls back to the
# bucketed path.
LEAD_FRAMES_PER_TOKEN = 8


def _bucket_tokens(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


def _bucket_frames(n: int, bucket: int = FRAME_BUCKET) -> int:
    return max(bucket, ((n + bucket - 1) // bucket) * bucket)


def _cut_once(rest: List[int], limit: int) -> Tuple[List[int], List[int]]:
    """Cut one chunk of at most ``limit`` tokens off the front of ``rest``,
    preferring silence boundaries, then word-end boundaries.  Returns
    (chunk, remainder); the remainder is empty when everything fit."""
    if len(rest) <= limit:
        return rest, []
    cut = None
    for i in range(limit - 1, 0, -1):
        if rest[i] == SIL_INDEX:
            cut = i
            break
    if cut is not None:
        return rest[: cut + 1], rest[cut:]  # shared sil leads the remainder
    for i in range(limit - 2, 0, -1):
        if rest[i] == WORD_END_INDEX:
            cut = i
            break
    if cut is None:  # pathological: no boundary at all — hard cut
        cut = limit - 2
    return rest[: cut + 1] + [SIL_INDEX], [SIL_INDEX] + rest[cut + 1 :]


def _chunk_token_rows(
    tokens: List[int],
    max_tokens: int,
    first_chunk_tokens: Optional[int] = None,
) -> List[List[int]]:
    """Split a token sequence into chunks of at most ``max_tokens``,
    preferring silence boundaries, then word-end boundaries.

    Every chunk starts and ends with ``sil`` — the layout the acoustic
    model is trained on.  When splitting at a sil it is shared: the chunk
    ends with it and the remainder starts with it; since each row's
    trailing-silence audio is trimmed, the pause at a junction comes from
    the next chunk's leading sil exactly once.

    ``first_chunk_tokens`` caps chunk 0 tighter than the rest — streaming
    uses a small lead chunk so time-to-first-audio pays for ~a sentence of
    decode instead of the full ``max_tokens`` cap.
    """
    chunks: List[List[int]] = []
    rest = list(tokens)
    limit = min(first_chunk_tokens or max_tokens, max_tokens)
    while True:
        chunk, rest = _cut_once(rest, limit)
        chunks.append(chunk)
        if not rest:
            return chunks
        limit = max_tokens


@dataclasses.dataclass
class SynthesisResult:
    wave: np.ndarray  # [S] float32 in [-1, 1]
    mel: np.ndarray  # [T, mel_dim]
    durations: np.ndarray  # [num_tokens] seconds


class Synthesizer:
    """Cached, bucketed text-to-speech pipeline."""

    def __init__(
        self,
        cfg: Config = Config(),
        duration_ckpt: Optional[str | Path] = None,
        acoustic_ckpt: Optional[str | Path] = None,
        hifigan_ckpt: Optional[str | Path] = None,
        lexicon_file: Optional[str | Path] = None,
        token_buckets: Sequence[int] = DEFAULT_TOKEN_BUCKETS,
        prenet_seed: int = 42,
        mesh=None,
    ):
        """``mesh``: an optional ``jax.sharding.Mesh`` with a ``data`` axis.
        When given, batched synthesis shards the batch across the mesh with
        ``shard_map`` — each device runs the full decode+vocode program
        (including the Pallas kernels) on its batch shard, with no
        cross-device communication.  Throughput scales with mesh size; the
        reference has no multi-device inference at all."""
        self.cfg = cfg
        ckpt_dir = Path(cfg.ckpt_dir)
        duration_ckpt = duration_ckpt or ckpt_dir / "duration_latest_ckpt.pickle"
        acoustic_ckpt = acoustic_ckpt or ckpt_dir / "acoustic_latest_ckpt.pickle"
        if hifigan_ckpt is None:
            for cand in (
                ckpt_dir / "hifigan_latest_ckpt.pickle",
                Path(cfg.hifigan_ckpt_dir) / "hk_hifi.pickle",
                ckpt_dir / "hk_hifi.pickle",
            ):
                if Path(cand).exists():
                    hifigan_ckpt = cand
                    break
        if hifigan_ckpt is None:
            raise FileNotFoundError(
                "no HiFi-GAN checkpoint found; pass hifigan_ckpt="
            )

        # Checkpoint loaders return host numpy trees; commit them to the
        # device ONCE.  Passed as host arrays, every jitted dispatch
        # re-uploads the full weight set (55+ MB for the vocoder alone) —
        # measured 0.8 s per streamed chunk / 1.8 s per single-dispatch
        # program over the tunnel, vs ~30 ms with device-resident handles.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            put = partial(
                jax.device_put,
                device=NamedSharding(mesh, PartitionSpec()),
            )
        else:
            put = jax.device_put
        self._duration_vars = put(load_variables(duration_ckpt, "duration"))
        self._acoustic_vars = put(load_variables(acoustic_ckpt, "acoustic"))
        self._hifigan_vars = put(load_variables(hifigan_ckpt, "hifigan"))

        self._duration_model = DurationModel(cfg.duration)
        self._acoustic_model = AcousticModel(cfg.acoustic)
        # "int8" quantizes the MRF convs (int8 MXU passes at 2x the bf16
        # rate on v5e) on top of bf16 storage for everything else; see
        # HifiGanConfig.inference_dtype for the measured quality bound.
        self._vocoder_quant = cfg.hifigan.inference_dtype == "int8"
        self._vocoder_dtype = (
            jnp.bfloat16
            if self._vocoder_quant
            or cfg.hifigan.inference_dtype in ("bfloat16", "bf16")
            else jnp.float32
        )
        self._generator = Generator(cfg.hifigan, dtype=self._vocoder_dtype)

        self.lexicon = (
            load_lexicon(lexicon_file) if lexicon_file is not None else None
        )
        self.token_buckets = tuple(token_buckets)
        # Largest token count routed through the single-dispatch program
        # (_lead_fn) by synthesize()/stream()/singleton batches.  Beyond
        # this the static LEAD_FRAMES_PER_TOKEN decode budget wastes more
        # device time than the saved duration round-trip.
        self.single_dispatch_max_tokens = 64
        self._prenet_key = jax.random.PRNGKey(prenet_seed)

        # shared by the jitted host path and the single-dispatch lead
        # program (tests/benches may swap _durations_traced for a stub)
        self._durations_traced = partial(self._duration_model.apply, train=False)
        self._predict_durations = jax.jit(
            lambda vars_, batch: self._durations_traced(vars_, batch)
        )
        # Two decode programs: the fused Pallas loop keeps all decoder
        # weights + streamed gate chunks in VMEM, which only fits for small
        # batches; large batches use the lax.scan path (whose batched
        # matmuls are efficient anyway).
        self._decode_mel_fused = jax.jit(
            partial(
                self._acoustic_model.apply,
                method=AcousticModel.inference,
                use_pallas=True,
            ),
            static_argnums=(3,),
        )
        self._decode_mel_scan = jax.jit(
            partial(
                self._acoustic_model.apply,
                method=AcousticModel.inference,
                use_pallas=False,
            ),
            static_argnums=(3,),
        )
        # Fused-decode batch gate, derived from the kernel's VMEM model:
        # usable whenever a feasible gate-stream chunk exists (measured on
        # v5e: fused wins 3.2x at B=1 and ~1.7x at B=8; the scan path's
        # batched matmuls take over where no chunk fits, scripts/bench_ar.py).
        if cfg.acoustic.fused_decode:
            from viettts_tpu.ops.ar_decoder import pick_chunk

            acfg = cfg.acoustic
            self._fused_decode_max_batch = 0
            b = 1
            while b <= 64 and pick_chunk(
                b, acfg.decoder_dim, acfg.prenet_dim, acfg.mel_dim,
                FRAME_BUCKET,
            ) is not None:
                self._fused_decode_max_batch = b
                b *= 2
        else:
            self._fused_decode_max_batch = 0

        # static int8 activation calibration (generator_calibrate_int8);
        # None = dynamic per-tile scales.  Set by calibrate_int8().
        self._act_scales = None
        self._build_vocode()

        self.mesh = mesh
        self._sharded_fns: Dict[int, callable] = {}
        self._lead_fns: Dict[Tuple[int, int], callable] = {}
        # frame buckets already compiled per (batch, token-bucket) shape —
        # filled by warmup() and by organic traffic; _dispatch_decode snaps
        # to these so clamped/unusual pacing reuses a compiled program
        # instead of paying an XLA compile mid-serving
        self._compiled_nf: Dict[Tuple[int, int], set] = {}
        self._warmed_up = False

    def _build_vocode(self) -> None:
        """(Re)build the jitted standalone vocoder program.  Re-run after
        ``self._act_scales`` changes (calibrate_int8)."""
        cfg = self.cfg
        if cfg.hifigan.fused_inference:
            from viettts_tpu.models.hifigan import generator_apply_fused

            interpret = jax.default_backend() == "cpu"
            hifi_params = self._hifigan_vars["params"]
            act_scales = self._act_scales
            self._vocode = jax.jit(
                lambda _vars, mel: generator_apply_fused(
                    cfg.hifigan, hifi_params, mel, interpret=interpret,
                    compute_dtype=self._vocoder_dtype,
                    quantize_int8=self._vocoder_quant,
                    act_scales=act_scales,
                )
            )
        else:
            self._vocode = jax.jit(self._generator.apply)

    # Default calibration set: deliberately diverse pacing/energy — a
    # plain greeting, a long multi-clause sentence, a short exclamation,
    # and digit-heavy text — so the per-conv amaxes see short/long/loud
    # activation regimes rather than one sentence's (advisor r4: a single
    # 9-word calibration range risks silent clipping on expressive input).
    CALIBRATION_TEXTS: Tuple[str, ...] = (
        "xin chào các bạn tôi nói tiếng Việt rất vui",
        "hôm nay trời nắng đẹp, chúng ta cùng nhau đi dạo quanh bờ hồ, "
        "ngắm hàng cây xanh và nghe tiếng chim hót líu lo trên cao",
        "tuyệt vời quá!",
        "số điện thoại là không chín tám bảy sáu năm bốn ba hai một",
    )

    def calibrate_int8(
        self,
        mel=None,
        text: Optional[str] = None,
        texts: Optional[Sequence[str]] = None,
        margin: float = 1.25,
    ) -> bool:
        """Calibrate static activation scales for the int8 vocoder route
        (``generator_calibrate_int8``) and rebind the vocoder programs —
        the per-conv dynamic amax reduces disappear from the serving
        kernels, out-of-range activations clip at the calibrated amax.

        Calibrates on ``mel`` [B, T, mel_dim] if given, else on the mels
        decoded from ``texts`` (default: ``CALIBRATION_TEXTS``, a diverse
        built-in set; ``text`` narrows it to one utterance).  Per-conv
        amaxes are tree-maxed across utterances and widened by ``margin``
        (default 1.25x — ~0.2 bit of int8 resolution as insurance against
        serving inputs outside the calibrated range; residual clipping is
        observable via ``int8_clip_stats``).  Call BEFORE ``warmup()``:
        already-compiled vocoder / sharded / lead programs are dropped and
        recompile on next use.  Returns True if calibration was applied
        (False when the route is not int8-fused).  No-op on the CPU
        backend, where the interpret Pallas calibration run would dominate
        startup.
        """
        if not (
            self._vocoder_quant
            and self.cfg.hifigan.fused_inference
            and jax.default_backend() != "cpu"
        ):
            return False
        from viettts_tpu.models.hifigan import generator_calibrate_int8

        if mel is not None:
            mels = [jnp.asarray(mel)]
        else:
            if texts is None:
                texts = (text,) if text is not None else self.CALIBRATION_TEXTS
            mels = [self._calibration_mel(t) for t in texts]
        cfg_h = self.cfg.hifigan
        hifi_params = self._hifigan_vars["params"]
        calib = jax.jit(
            lambda m: generator_calibrate_int8(cfg_h, hifi_params, m)
        )
        scales = calib(mels[0])
        for m in mels[1:]:
            scales = jax.tree.map(jnp.maximum, scales, calib(m))
        self._act_scales = jax.tree.map(lambda s: s * margin, scales)
        self._build_vocode()
        self._sharded_fns.clear()
        self._lead_fns.clear()
        return True

    def _calibration_mel(self, text: str):
        """Decode ``text`` to a mel through the production decode path
        (token ids -> durations -> bucketed AR decode)."""
        ids = self.text_to_token_ids(text)
        toks, lengths, dur_s = self._durations_for([ids], -1.0)
        fps = self.cfg.dsp.sample_rate / self.cfg.dsp.hop_length
        dur_frames = dur_s * fps
        n_frames = _bucket_frames(int(dur_frames.sum(axis=1).max()) + 1)
        return self._decode_mel(
            self._acoustic_vars,
            jnp.asarray(toks),
            jnp.asarray(dur_frames),
            int(n_frames),
            jnp.asarray(lengths),
            rngs={"prenet": self._prenet_key},
        )

    def int8_clip_stats(self, mel=None, text: Optional[str] = None) -> dict:
        """Sampled out-of-range probe for the static int8 route: fraction
        of each MRF conv input that exceeds its calibrated amax (and would
        be hard-clipped by the kernel) on ``mel`` / the mel decoded from
        ``text``.  Returns ``{"max_clip_fraction": float, "per_stage":
        {stage: [fractions]}}``; also kept on the instance as
        ``last_clip_stats`` for observability surfaces (serve.py /stats).
        Costs one f32 vocoder forward — intended for periodic sampling,
        not per-request.  Raises if the route is not calibrated."""
        if self._act_scales is None:
            raise RuntimeError(
                "int8_clip_stats requires static-int8 calibration "
                "(calibrate_int8/warmup on the int8 route)"
            )
        from viettts_tpu.models.hifigan import generator_int8_clip_stats

        if mel is None:
            mel = self._calibration_mel(
                text if text is not None else self.CALIBRATION_TEXTS[0]
            )
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        cfg_h = self.cfg.hifigan
        hifi_params = self._hifigan_vars["params"]
        act_scales = self._act_scales
        fracs = jax.jit(
            lambda m: generator_int8_clip_stats(
                cfg_h, hifi_params, m, act_scales
            )
        )(mel)
        per_stage = {
            int(k): np.asarray(v).tolist() for k, v in fracs.items()
        }
        stats = {
            "max_clip_fraction": max(
                (max(v) for v in per_stage.values()), default=0.0
            ),
            "per_stage": per_stage,
        }
        self.last_clip_stats = stats
        return stats

    def _decode_mel(self, variables, toks, frames, n_frames, lengths, rngs):
        """Dispatch-level decode routing (two separately-jitted programs,
        reused independently across shape buckets — combining decode and
        vocode into one jitted program was measured compile-bound: the
        cross-product of (token bucket, frame bucket, batch) shapes each
        recompiles the whole pipeline)."""
        B = toks.shape[0]
        mb = self._fused_decode_max_batch
        if mb and B <= mb:
            return self._decode_mel_fused(
                variables, toks, frames, n_frames, lengths, rngs=rngs
            )
        if mb and B % mb == 0:
            # Larger batches run as sub-batches of the fused kernel — still
            # ~2x faster than one big scan decode (scripts/bench_ar.py:
            # fused B=32 5.8 ms vs scan B=64 25.5 ms per 1024 frames).
            mels = [
                self._decode_mel_fused(
                    variables,
                    toks[i : i + mb],
                    frames[i : i + mb],
                    n_frames,
                    lengths[i : i + mb],
                    rngs=rngs,
                )
                for i in range(0, B, mb)
            ]
            return jnp.concatenate(mels, axis=0)
        return self._decode_mel_scan(
            variables, toks, frames, n_frames, lengths, rngs=rngs
        )

    def _decode_mel_traced(self, avars, toks, durs, n_frames, lengths, key):
        """Decode routing (fused kernel / fused sub-batches / scan) as
        traced ops, for embedding inside a larger jitted program.  Batches
        beyond the fused kernel's VMEM gate run as fused sub-batches —
        still ~2x faster than one big scan decode (scripts/bench_ar.py:
        fused B=32 5.8 ms vs scan B=64 25.5 ms per 1024 frames)."""
        B = toks.shape[0]
        mb = self._fused_decode_max_batch
        rngs = {"prenet": key}

        def apply(t, d, l, use_pallas):
            return self._acoustic_model.apply(
                avars, t, d, n_frames, l,
                method=AcousticModel.inference,
                use_pallas=use_pallas,
                rngs=rngs,
            )

        if mb and B <= mb:
            return apply(toks, durs, lengths, True)
        if mb and B % mb == 0:
            return jnp.concatenate(
                [
                    apply(
                        toks[i : i + mb], durs[i : i + mb],
                        lengths[i : i + mb], True,
                    )
                    for i in range(0, B, mb)
                ],
                axis=0,
            )
        return apply(toks, durs, lengths, False)

    def _vocode_traced(self, hvars, mel, interpret):
        if self.cfg.hifigan.fused_inference:
            from viettts_tpu.models.hifigan import generator_apply_fused

            return generator_apply_fused(
                self.cfg.hifigan, hvars["params"], mel, interpret=interpret,
                compute_dtype=self._vocoder_dtype,
                quantize_int8=self._vocoder_quant,
                act_scales=self._act_scales,
            )
        return self._generator.apply(hvars, mel)

    # ------------------------------------------------------------------
    # mesh-sharded serving

    def _sharded_fn(self, n_frames: int):
        """Jitted shard_map program for one frame bucket: batch split on
        the ``data`` axis, params replicated, each device running its own
        fused decode + vocoder on its shard (SPMD serving; no collective
        is needed anywhere in the pipeline)."""
        fn = self._sharded_fns.get(n_frames)
        if fn is not None:
            return fn
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map  # jax >= 0.8
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        interpret = jax.default_backend() == "cpu"

        def per_shard(avars, hvars, toks, durs, lengths, key):
            # distinct prenet-dropout streams per shard
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            mel = self._decode_mel_traced(
                avars, toks, durs, n_frames, lengths, key
            )
            return mel, self._vocode_traced(hvars, mel, interpret)

        fn = jax.jit(
            shard_map(
                per_shard,
                mesh=self.mesh,
                in_specs=(P(), P(), P("data"), P("data"), P("data"), P()),
                out_specs=(P("data"), P("data")),
                check_vma=False,
            )
        )
        self._sharded_fns[n_frames] = fn
        return fn

    # ------------------------------------------------------------------
    # single-dispatch synthesis

    def _lead_fn(self, T: int, n_frames: int):
        """One-dispatch program for a [1, T] token row: duration model ->
        duration postprocess -> AR decode -> vocoder, all inside a single
        jit.  The bucketed path needs two blocking host<->device
        round-trips before audio exists (fetch durations to pick a frame
        bucket, then fetch the wave — each ~30-45 ms on a tunneled TPU)
        and decodes a full-size chunk; here the frame budget is static
        (``LEAD_FRAMES_PER_TOKEN`` per token) so nothing comes back to
        the host mid-pipeline.  Decode beyond the true frame total is
        wasted-but-cheap masked work, and the true total is returned for
        host-side trimming and overflow fallback.  Measured (v5e,
        scripts/bench_stream.py): first audio in 52 ms vs 138 ms for a
        full bucketed chunk 0 and 171 ms for one-shot synthesis."""
        fn = self._lead_fns.get((T, n_frames))
        if fn is not None:
            return fn
        interpret = jax.default_backend() == "cpu"
        fps = self.cfg.dsp.sample_rate / self.cfg.dsp.hop_length

        def program(dvars, avars, hvars, toks, lengths, sil_dur, key):
            durs = self._durations_traced(
                dvars, DurationBatch(toks, lengths, None)
            )
            # postprocess (reference text2mel.py:90-97); sil_dur < 0
            # disables clamping — traced, so one program serves any value
            clamp = jnp.logical_and(sil_dur >= 0, toks == SIL_INDEX)
            durs = jnp.where(clamp, jnp.maximum(durs, sil_dur), durs)
            durs = jnp.where(toks == WORD_END_INDEX, 0.0, durs)
            mask = jnp.arange(toks.shape[1])[None, :] < lengths[:, None]
            durs = jnp.where(mask, durs, 0.0)
            dur_frames = durs * fps
            total_frames = dur_frames.sum(axis=1)
            mel = self._decode_mel_traced(
                avars, toks, dur_frames, n_frames, lengths, key
            )
            wave = self._vocode_traced(hvars, mel, interpret)
            return wave, mel, durs, total_frames

        fn = jax.jit(program)
        self._lead_fns[(T, n_frames)] = fn
        return fn

    def _synthesize_single_fused(
        self, row: List[int], silence_duration: float
    ) -> Optional[SynthesisResult]:
        """Synthesize one token row in a single device dispatch (see
        ``_lead_fn``).  Returns None when the predicted frame total
        overflows the static budget (pathological pacing, e.g. a huge
        ``silence_duration``) — callers fall back to the bucketed path."""
        if jax.default_backend() == "cpu" and (
            self.cfg.hifigan.fused_inference or self._fused_decode_max_batch
        ):
            # Interpret-mode Pallas unrolls its grid into the traced
            # program; embedding it in the combined jit makes XLA's CPU
            # compile take minutes.  The lead chunk is a dispatch-latency
            # optimization — on CPU the bucketed fallback is strictly
            # better.
            return None
        T = _bucket_tokens(len(row), self.token_buckets)
        n_frames = _bucket_frames(T * LEAD_FRAMES_PER_TOKEN)
        toks = np.zeros((1, T), np.int32)
        toks[0, : len(row)] = row
        lengths = np.asarray([len(row)], np.int32)
        toks_d, lengths_d = jnp.asarray(toks), jnp.asarray(lengths)
        if self.mesh is not None:
            # Replicate the inputs over the mesh so the one-dispatch
            # program compiles as a replicated SPMD executable: every
            # device decodes the same row and the fetch reads any replica.
            # A 1-row batch can't shard, and the bucketed path pads the
            # batch to the mesh anyway — replication costs the same FLOPs
            # while keeping the single-round-trip TTFA win under scale-out.
            from viettts_tpu.parallel.mesh import replicated_sharding

            rep = replicated_sharding(self.mesh)
            toks_d, lengths_d = jax.device_put((toks_d, lengths_d), rep)
        out = self._lead_fn(T, n_frames)(
            self._duration_vars,
            self._acoustic_vars,
            self._hifigan_vars,
            toks_d,
            lengths_d,
            jnp.float32(silence_duration),
            self._prenet_key,
        )
        # one batched fetch: on the tunnel every device_get is a round-trip
        wave, mel, dur_s, total_frames = jax.device_get(out)
        if float(total_frames[0]) + 1 > n_frames:
            return None
        return self._finalize_rows(
            ([row], mel, wave, dur_s, total_frames)
        )[0]

    # ------------------------------------------------------------------

    def warmup(
        self,
        frame_buckets: Optional[Sequence[int]] = None,
        batch_sizes: Sequence[int] = (1,),
        token_buckets: Optional[Sequence[int]] = None,
        lead_tokens: Optional[int] = None,
        silence_durations: Sequence[float] = (),
    ) -> None:
        """Pre-compile the decode + vocoder programs for the given frame
        buckets, batch sizes and token buckets (default: every configured
        token bucket), so first real requests don't pay XLA compilation
        latency.  With a mesh, batch sizes are rounded up to a multiple of
        the ``data`` axis — the same padding ``_dispatch_rows`` applies —
        so the warmed shapes are exactly the shapes serving dispatches.

        The frame bucket a request dispatches is duration-dependent
        (``_dispatch_decode`` buckets the predicted total frames), so
        ``frame_buckets=None`` derives, per token bucket, the buckets
        spanning ~4-8 frames per token (~65-130 ms/phoneme — the range
        real Vietnamese speech produces).  ``silence_durations`` extends
        that coverage for sil-clamped requests: a clamp of ``s`` seconds
        can pace sil tokens at ``s * frames_per_sec`` frames/token (worst
        case: a row of all-sil tokens), so for each clamp the range above
        8 frames/token is covered in 2x steps — combined with
        ``_dispatch_decode``'s snap-to-compiled-bucket, any clamped
        request then reuses a warmed program (at most ~2x decode padding)
        instead of compiling mid-serving.  Pass explicit ``frame_buckets``
        to pin coverage exactly."""
        if self._vocoder_quant and self._act_scales is None:
            # Static int8 activation calibration first, so every program
            # compiled below embeds the calibrated scales (measured on v5e
            # B=64 T=768: vocoder 196.6 ms static vs 215.7 ms dynamic at
            # the same 0.78% held-out quality bound — the per-conv amax
            # reduce leaves the kernel critical path).  No-op on CPU.
            self.calibrate_int8()
        token_buckets = tuple(
            token_buckets if token_buckets is not None else self.token_buckets
        )
        fps = self.cfg.dsp.sample_rate / self.cfg.dsp.hop_length
        sizes = []
        for b in batch_sizes:
            if self.mesh is not None:
                n_dev = self.mesh.shape["data"]
                b = -(-b // n_dev) * n_dev
            if b not in sizes:
                sizes.append(b)
        for b in sizes:
            for tb in token_buckets:
                toks = jnp.zeros((b, tb), jnp.int32)
                lengths = jnp.full((b,), 2, jnp.int32)
                self._predict_durations(
                    self._duration_vars, DurationBatch(toks, lengths, None)
                )
                fbs = frame_buckets
                if fbs is None:
                    cover = {_bucket_frames(tb * 4), _bucket_frames(tb * 8)}
                    for s in silence_durations:
                        ceil_f = tb * max(8.0, float(s) * fps)
                        f = tb * 8
                        while f < ceil_f:
                            f = min(f * 2, ceil_f)
                            cover.add(_bucket_frames(int(f)))
                    fbs = sorted(cover)
                for nf in fbs:
                    # explicit dtype: jnp.full with a python float makes a
                    # weak_type array, which is a *different* jit signature
                    # than the strong f32 the real dispatch passes — the
                    # warmed program would never be reused
                    durs = jnp.full((b, tb), nf / tb, jnp.float32)
                    if self.mesh is not None:
                        _, wave = self._sharded_fn(int(nf))(
                            self._acoustic_vars, self._hifigan_vars, toks,
                            durs, lengths, self._prenet_key,
                        )
                    else:
                        mel = self._decode_mel(
                            self._acoustic_vars, toks, durs, int(nf), lengths,
                            rngs={"prenet": self._prenet_key},
                        )
                        wave = self._vocode(self._hifigan_vars, mel)
                    jax.block_until_ready(wave)
                    self._compiled_nf.setdefault((b, tb), set()).add(int(nf))
        # Also warm the single-dispatch programs stream() leads with (the
        # token buckets a lead chunk can land in).  ``lead_tokens=None``
        # warms the stream() default (64) on device backends and skips on
        # CPU, where the interpret-mode Pallas run would dominate warmup.
        if lead_tokens is None:
            lead_tokens = (
                0
                if jax.default_backend() == "cpu"
                else self.single_dispatch_max_tokens
            )
        if lead_tokens and 1 in batch_sizes:
            for tb in token_buckets:
                if tb <= lead_tokens:
                    self._synthesize_single_fused(
                        [SIL_INDEX] * max(tb - 1, 1), -1.0
                    )
        self._warmed_up = True

    def text_to_token_ids(self, text: str) -> List[int]:
        return text_to_tokens(normalize_text(text), self.lexicon)

    def vocode(self, mel) -> np.ndarray:
        """Log-mel [B, T, mel_dim] -> waveform [B, T*hop] float32 (the
        public mel->wave surface; reference mel2wave.py:20-41)."""
        mel = jnp.asarray(mel)
        assert mel.ndim == 3, "expected [B, T, mel_dim]"
        wav = self._vocode(self._hifigan_vars, mel)
        return np.asarray(wav[..., 0])

    def _durations_for(
        self, token_rows: List[List[int]], silence_duration: float
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Predict + postprocess durations.  Returns (padded token ids
        [B, T], lengths [B], durations-in-seconds [B, T])."""
        B = len(token_rows)
        T = _bucket_tokens(max(len(r) for r in token_rows), self.token_buckets)
        toks = np.zeros((B, T), np.int32)
        lengths = np.zeros((B,), np.int32)
        for i, row in enumerate(token_rows):
            toks[i, : len(row)] = row
            lengths[i] = len(row)
        durations = np.asarray(
            self._predict_durations(
                self._duration_vars,
                DurationBatch(jnp.asarray(toks), jnp.asarray(lengths), None),
            )
        )
        # Postprocess (reference text2mel.py:90-97): clamp silences, zero
        # word-end markers, zero padding.
        if silence_duration >= 0:
            durations = np.where(
                toks == SIL_INDEX,
                np.clip(durations, silence_duration, None),
                durations,
            )
        durations = np.where(toks == WORD_END_INDEX, 0.0, durations)
        mask = np.arange(T)[None, :] < lengths[:, None]
        durations = np.where(mask, durations, 0.0)
        return toks, lengths, durations

    # ------------------------------------------------------------------

    def synthesize(
        self, text: str, silence_duration: float = -1.0
    ) -> SynthesisResult:
        """Synthesize one text.  Inputs longer than the acoustic model's
        training cap (cfg.data.max_phoneme_seq_len) are split at silence
        boundaries into chunks, synthesized as one padded batch, and
        concatenated — the reference feeds arbitrarily long sequences
        through whole (synthesizer.py:25-30 only maps punctuation to sil),
        which the model was never trained for."""
        tokens = self.text_to_token_ids(text)
        max_tokens = self.cfg.data.max_phoneme_seq_len
        if len(tokens) <= max_tokens:
            if len(tokens) <= self.single_dispatch_max_tokens:
                # Short utterances (the common serving request) go through
                # the single-dispatch program: one round-trip instead of
                # two, measured 52 ms vs 138 ms on v5e (see _lead_fn).
                res = self._synthesize_single_fused(tokens, silence_duration)
                if res is not None:
                    return res
            return self._synthesize_rows([tokens], silence_duration)[0]
        rows = _chunk_token_rows(tokens, max_tokens)
        parts = self._synthesize_rows(rows, silence_duration)
        return SynthesisResult(
            wave=np.concatenate([p.wave for p in parts]),
            mel=np.concatenate([p.mel for p in parts], axis=0),
            durations=np.concatenate([p.durations for p in parts]),
        )

    def stream(
        self,
        text: str,
        silence_duration: float = -1.0,
        lead_tokens: int = 64,
    ):
        """Streaming synthesis: yield one ``SynthesisResult`` per chunk of
        ``text`` (split at silence boundaries, the same chunking as
        ``synthesize``), with one-chunk-ahead dispatch — chunk i+1's
        decode+vocode runs on-device while chunk i's audio is fetched and
        consumed.

        Chunk 0 is cut at ``lead_tokens`` (default 64: roughly one
        sentence) instead of the full ``max_phoneme_seq_len`` cap, and is
        synthesized by the **single-dispatch** program (``_lead_fn``:
        duration -> decode -> vocode in one jit), so time-to-first-audio
        pays one host<->device round-trip and a small decode+vocode — the
        bucketed path needs two blocking round-trips (fetch durations,
        fetch wave) and a full-size chunk-0 program (0 disables the lead
        chunk; measured 52 ms vs 138 ms TTFA on v5e,
        scripts/bench_stream.py).  Concatenating the yielded waves reproduces
        ``synthesize(text)`` up to prenet-dropout rng (bit-exact with
        ``acoustic.prenet_dropout_at_inference=False``) and ~1-LSB batch
        routing differences.  The reference has no streaming path (its
        synthesizer.py emits one wav after the whole pipeline)."""
        from collections import deque

        tokens = self.text_to_token_ids(text)
        rows = _chunk_token_rows(
            tokens,
            self.cfg.data.max_phoneme_seq_len,
            first_chunk_tokens=lead_tokens or None,
        )
        if lead_tokens:
            lead = self._synthesize_single_fused(rows[0], silence_duration)
            if lead is not None:
                yield lead
                rows = rows[1:]
                if not rows:
                    return
        # One tiny batched duration call for every remaining chunk up
        # front: the per-chunk decode dispatch then needs no device fetch,
        # so chunk i+1's programs queue behind chunk i's instead of the
        # host blocking on a duration read between them.
        toks, lengths, dur_s = self._durations_for(rows, silence_duration)
        n_rep = 1 if self.mesh is None else self.mesh.shape["data"]

        def dispatch(i):
            if n_rep > 1:
                # A 1-row chunk can't shard over the mesh: replicate it
                # across the data axis (duplicates dropped via pad) so the
                # per-chunk program is the same sharded executable batched
                # serving compiles, and dispatch stays fully async — the
                # round-3 mesh path fetched each chunk synchronously,
                # losing both streaming wins under scale-out.
                return self._dispatch_decode(
                    [rows[i]] * n_rep,
                    np.repeat(toks[i : i + 1], n_rep, 0),
                    np.repeat(lengths[i : i + 1], n_rep, 0),
                    np.repeat(dur_s[i : i + 1], n_rep, 0),
                    pad=n_rep - 1,
                )
            return self._dispatch_decode(
                [rows[i]], toks[i : i + 1], lengths[i : i + 1],
                dur_s[i : i + 1],
            )

        handles: deque = deque()
        for i in range(len(rows)):
            handles.append(dispatch(i))
            # Chunk 0 is fetched as soon as it is dispatched (minimum
            # time-to-first-audio); afterwards one chunk stays in flight
            # so the device computes chunk i+1 while the consumer plays
            # chunk i.
            while len(handles) >= (2 if i > 0 else 1):
                yield self._finalize_rows(handles.popleft())[0]
        while handles:
            yield self._finalize_rows(handles.popleft())[0]

    def synthesize_batch(
        self, texts: Sequence[str], silence_duration: float = -1.0
    ) -> List[SynthesisResult]:
        """Synthesize a batch of texts in one padded device program.

        The batch dimension is padded up to a power-of-two bucket (like the
        token/frame dims), so serving arbitrary concurrency compiles a
        handful of programs instead of one per distinct batch size."""
        token_rows = [self.text_to_token_ids(t) for t in texts]
        n = len(token_rows)
        if n == 1 and len(token_rows[0]) <= self.single_dispatch_max_tokens:
            # A lone short request (quiet server) takes the one-round-trip
            # program instead of the two-round-trip bucketed path.
            res = self._synthesize_single_fused(
                token_rows[0], silence_duration
            )
            if res is not None:
                return [res]
        bucket = 1
        while bucket < n:
            bucket *= 2
        # pad with minimal silent rows; dropped from the results below
        token_rows = token_rows + [[SIL_INDEX]] * (bucket - n)
        return self._synthesize_rows(token_rows, silence_duration)[:n]

    def _synthesize_rows(
        self, token_rows: List[List[int]], silence_duration: float = -1.0
    ) -> List[SynthesisResult]:
        return self._finalize_rows(
            self._dispatch_rows(token_rows, silence_duration)
        )

    def _dispatch_rows(
        self, token_rows: List[List[int]], silence_duration: float = -1.0
    ):
        """Run duration prediction and *dispatch* the decode+vocode device
        programs without fetching their results: the returned handle can be
        finalized later, letting the caller overlap this batch's device
        compute with host work (or the next batch's dispatch) — the basis
        of ``stream()``."""
        if self.mesh is not None:
            # pad the batch to a multiple of the mesh so it splits evenly
            n_dev = self.mesh.shape["data"]
            pad = (-len(token_rows)) % n_dev
            token_rows = token_rows + [[SIL_INDEX]] * pad
        else:
            pad = 0
        toks, lengths, dur_s = self._durations_for(token_rows, silence_duration)
        return self._dispatch_decode(token_rows, toks, lengths, dur_s, pad)

    def _dispatch_decode(self, token_rows, toks, lengths, dur_s, pad=0):
        """Device-dispatch decode+vocode for already-predicted durations
        (host arrays).  Pure async dispatch — no device fetch happens
        here, so consecutive calls queue on the device back-to-back."""
        cfg = self.cfg

        frames_per_sec = cfg.dsp.sample_rate / cfg.dsp.hop_length
        dur_frames = dur_s * frames_per_sec
        total_frames = dur_frames.sum(axis=1)
        needed = int(np.max(total_frames)) + 1
        n_frames = _bucket_frames(needed)
        shape_key = (toks.shape[0], toks.shape[1])
        compiled = self._compiled_nf.setdefault(shape_key, set())
        if n_frames not in compiled:
            # Snap up to an already-compiled frame bucket when one fits
            # with bounded waste (<= 2x the natural bucket): decode+vocode
            # cost is linear in frames, but an XLA compile mid-serving is
            # 20-40 s over a tunneled TPU — padding into a warmed program
            # wins by orders of magnitude.
            snap = [f for f in compiled if needed <= f <= 2 * n_frames]
            if snap:
                n_frames = min(snap)
            else:
                if self._warmed_up:
                    logger.warning(
                        "frame bucket %d (batch=%d, tokens=%d) not covered "
                        "by warmup; compiling a new program mid-serving — "
                        "widen warmup(frame_buckets=..., "
                        "silence_durations=...)",
                        n_frames, *shape_key,
                    )
                compiled.add(n_frames)

        if self.mesh is not None:
            mels, waves = self._sharded_fn(n_frames)(
                self._acoustic_vars,
                self._hifigan_vars,
                jnp.asarray(toks),
                jnp.asarray(dur_frames),
                jnp.asarray(lengths),
                self._prenet_key,
            )
        else:
            mels = self._decode_mel(
                self._acoustic_vars,
                jnp.asarray(toks),
                jnp.asarray(dur_frames),
                n_frames,
                jnp.asarray(lengths),
                rngs={"prenet": self._prenet_key},
            )
            waves = self._vocode(self._hifigan_vars, mels)  # [B, T*256, 1]
        if pad:
            token_rows = token_rows[:-pad]
        return token_rows, mels, waves, dur_s, total_frames

    def _finalize_rows(self, handle) -> List[SynthesisResult]:
        """Fetch a dispatched batch to the host and trim each row."""
        token_rows, mels, waves, dur_s, total_frames = handle
        cfg = self.cfg
        frames_per_sec = cfg.dsp.sample_rate / cfg.dsp.hop_length
        waves = np.asarray(waves[..., 0])
        mels = np.asarray(mels)

        hop = cfg.dsp.hop_length
        results = []
        for i, row in enumerate(token_rows):
            keep = int(total_frames[i])
            # Trailing-silence trim (reference text2mel.py:99-102).
            if row and row[-1] == SIL_INDEX:
                sil_frames = int(dur_s[i, len(row) - 1] * frames_per_sec)
                keep = max(keep - sil_frames, 1)
            results.append(
                SynthesisResult(
                    wave=waves[i, : keep * hop],
                    mel=mels[i, :keep],
                    durations=dur_s[i, : len(row)],
                )
            )
        return results
