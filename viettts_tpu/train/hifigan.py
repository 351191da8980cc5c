"""HiFi-GAN vocoder trainer (from-scratch and GTA finetuning).

New first-party scope: the reference delegates vocoder GAN training to the
upstream PyTorch hifi-gan repo (README.md:61-100) and only vendors the
dataset/loss code for documentation (create_mel.py, torch_model.py:383-414).
This trainer reproduces that recipe natively:

* random fixed-size segment cropping (``segment_size`` samples per example,
  create_mel.py:137-171) so every batch is one static shape;
* generator loss = LSGAN adversarial (MPD + MSD) + 2x feature matching +
  45x L1 mel loss, discriminator loss = LSGAN (upstream train.py recipe);
* AdamW(b1=0.8, b2=0.99) with the upstream per-epoch 0.999 exponential LR
  decay (one epoch = one pass over the dataset, train.py scheduler.step());
* ``fine_tuning`` mode pairs GTA-predicted mels (tools/gta.py) with real
  audio, exactly like the reference finetune path;
* generator trains with explicit weight-norm reparameterization; weights are
  folded into plain kernels for the inference checkpoint.

Runs data-parallel over the mesh like the other trainers: one jitted update
performing a discriminator step then a generator step.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Iterator, NamedTuple, Optional, Tuple

import numpy as np
import optax

import jax
import jax.numpy as jnp

from viettts_tpu.config import Config
from viettts_tpu.data.audio import read_wav
from viettts_tpu.models.hifigan import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_matching_loss,
    fold_weight_norm,
    generator_adversarial_loss,
)
from viettts_tpu.ops.mel import LogMelSpectrogram
from viettts_tpu.parallel.mesh import make_mesh, mesh_for_batch, replicate, shard_batch
from viettts_tpu.train.checkpoint import (
    NATIVE_FORMAT,
    load_checkpoint,
    save_checkpoint,
)
from viettts_tpu.train.common import MetricAverager

MEL_LOSS_WEIGHT = 45.0
FM_LOSS_WEIGHT = 1.0  # feature_matching_loss already multiplies by 2


class GanState(NamedTuple):
    step: jax.Array
    gen_params: dict
    disc_params: dict  # {"mpd": ..., "msd": ...} (trainable params only)
    spectral: dict  # MSD spectral-norm power-iteration state (u vectors)
    gen_opt: dict
    disc_opt: dict
    rng: jax.Array


class VocoderDataset:
    """Waveforms (and optional GTA mels) in RAM; random segment batches.

    Each example yields (mel_input [F, mel_dim], audio [segment_size]):
    ``mel_input`` is the conditioning mel — GTA-predicted in finetuning,
    ground-truth otherwise (computed lazily on device from the audio when
    ``gta_dir`` is None, in which case this yields audio only).
    """

    def __init__(
        self,
        wav_dir: Path,
        segment_size: int,
        hop: int,
        gta_dir: Optional[Path] = None,
        sample_rate: int = 16000,
    ):
        self.segment_size = segment_size
        self.hop = hop
        self.frames = segment_size // hop
        self.wavs = []
        self.mels = []  # only in finetuning mode
        self.gta = gta_dir is not None
        for wav_file in sorted(Path(wav_dir).glob("*.wav")):
            sr, y = read_wav(wav_file)
            if y.ndim > 1:
                y = y[:, 0]
            y = y.astype(np.float32) / (2.0**15)
            if len(y) < segment_size + hop:
                y = np.pad(y, (0, segment_size + hop - len(y)))
            if self.gta:
                mel_file = Path(gta_dir) / f"{wav_file.stem}.npy"
                if not mel_file.exists():
                    continue
                mel = np.load(mel_file).T.astype(np.float32)  # [T, D]
                if mel.shape[0] < self.frames + 1:
                    continue
                self.mels.append(mel)
            self.wavs.append(y)
        if not self.wavs:
            raise ValueError(f"no usable audio in {wav_dir}")

    def __len__(self):
        return len(self.wavs)

    def batches(self, batch_size: int, seed: int = 0) -> Iterator:
        rng = np.random.RandomState(seed)
        n = len(self.wavs)
        while True:
            idx = rng.randint(0, n, size=batch_size)
            audio = np.zeros((batch_size, self.segment_size), np.float32)
            if self.gta:
                mels = np.zeros(
                    (batch_size, self.frames, self.mels[0].shape[1]),
                    np.float32,
                )
            for j, i in enumerate(idx):
                y = self.wavs[i]
                if self.gta:
                    mel = self.mels[i]
                    max_f = min(len(y) // self.hop, mel.shape[0]) - self.frames
                    f0 = rng.randint(0, max(max_f, 1))
                    mels[j] = mel[f0 : f0 + self.frames]
                    audio[j] = y[f0 * self.hop : f0 * self.hop + self.segment_size]
                else:
                    s0 = rng.randint(0, len(y) - self.segment_size + 1)
                    # align crops to hop boundaries so mel(audio) frames
                    # match conditioning frames
                    s0 = (s0 // self.hop) * self.hop
                    audio[j] = y[s0 : s0 + self.segment_size]
            yield (mels if self.gta else None, audio)


def make_gan_step(
    cfg: Config,
    generator: Generator,
    mpd: MultiPeriodDiscriminator,
    msd: MultiScaleDiscriminator,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    mel_fn: LogMelSpectrogram,
):
    """One jitted GAN update: discriminator step, then generator step.

    With ``cfg.train.mixed_precision`` the forward/backward compute of the
    generator and both discriminator stacks runs in bfloat16 (params cast
    at the loss boundary — the same scheme as
    ``train.common.mixed_precision_loss``); master params, optimizer
    state, loss reductions, and the mel-spectrogram L1 stay float32.
    """

    mixed = cfg.train.mixed_precision

    def _cast(tree, dt=jnp.bfloat16):
        if not mixed:
            return tree
        return jax.tree.map(
            lambda x: x.astype(dt)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    def disc_loss_fn(disc_params, spectral, y, y_hat):
        disc_params = _cast(disc_params)
        spectral, y, y_hat = _cast(spectral), _cast(y), _cast(y_hat)
        p_r, p_g, _, _ = mpd.apply({"params": disc_params["mpd"]}, y, y_hat)
        (s_r, s_g, _, _), updates = msd.apply(
            {"params": disc_params["msd"], "spectral": spectral},
            y, y_hat, update_stats=True, mutable=["spectral"],
        )
        loss = discriminator_loss(p_r, p_g) + discriminator_loss(s_r, s_g)
        spectral_new = jax.tree.map(
            lambda x: x.astype(jnp.float32), updates["spectral"]
        )
        return loss, spectral_new

    def gen_loss_fn(gen_params, disc_params, spectral, mel_in, y, mel_target):
        y_hat = generator.apply({"params": gen_params}, mel_in)
        # mel L1 in f32: the log-compressed spectral distance is the
        # training signal most sensitive to precision.
        mel_hat = mel_fn(y_hat[..., 0].astype(jnp.float32))
        mel_l1 = jnp.mean(jnp.abs(mel_hat - mel_target))
        disc_params = _cast(disc_params)
        spectral, y = _cast(spectral), _cast(y)
        y_hat = _cast(y_hat)

        p_r, p_g, p_fr, p_fg = mpd.apply({"params": disc_params["mpd"]}, y, y_hat)
        s_r, s_g, s_fr, s_fg = msd.apply(
            {"params": disc_params["msd"], "spectral": spectral}, y, y_hat
        )
        adv = generator_adversarial_loss(p_g) + generator_adversarial_loss(s_g)
        fm = feature_matching_loss(p_fr, p_fg) + feature_matching_loss(
            s_fr, s_fg
        )
        loss = adv + FM_LOSS_WEIGHT * fm + MEL_LOSS_WEIGHT * mel_l1
        return loss, (mel_l1, adv, fm)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: GanState, mel_in, audio):
        y = audio[..., None]  # [B, S, 1]
        mel_target = mel_fn(audio)
        cond = mel_in if mel_in is not None else mel_target

        # --- discriminator step (generator frozen) ---
        # (generator compute dtype comes from its module `dtype`; params
        # stay f32 so the weight-norm reparameterization stays f32)
        y_hat = generator.apply({"params": state.gen_params}, cond)
        y_hat_sg = jax.lax.stop_gradient(y_hat)
        (d_loss, spectral), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.disc_params, state.spectral, y, y_hat_sg)
        d_updates, disc_opt = disc_tx.update(
            d_grads, state.disc_opt, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # --- generator step (new discriminator, frozen) ---
        (g_loss, (mel_l1, adv, fm)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.gen_params, disc_params, spectral, cond, y, mel_target)
        g_updates, gen_opt = gen_tx.update(
            g_grads, state.gen_opt, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = GanState(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            spectral=spectral,
            gen_opt=gen_opt,
            disc_opt=disc_opt,
            rng=state.rng,
        )
        metrics = {
            "disc_loss": d_loss,
            "gen_loss": g_loss,
            "mel_l1": mel_l1,
            "adv": adv,
            "fm": fm,
        }
        return new_state, metrics

    return step


def _orbax_dir(path: Path) -> Path:
    return Path(path).with_suffix(".orbax")


def save_vocoder_ckpt(path: Path, state: GanState, fmt: str = "pickle") -> None:
    """Write the vocoder checkpoint.  ``fmt="pickle"``: one atomic file with
    both the folded inference params and the raw resumable GAN state.
    ``fmt="orbax"``: the ~1 GB raw state goes to a sharded tensorstore dir
    (where sharded checkpoints matter most) and the small folded inference
    params stay in the pickle so the serving loaders keep working."""
    raw = {
        "gen_params": state.gen_params,
        "disc_params": state.disc_params,
        "spectral": state.spectral,
        "gen_opt": state.gen_opt,
        "disc_opt": state.disc_opt,
        "rng": state.rng,
    }
    if fmt == "orbax":
        from viettts_tpu.train.checkpoint import save_checkpoint_orbax

        save_checkpoint_orbax(
            _orbax_dir(path),
            {"step": np.asarray(int(state.step), np.int32), "raw": raw},
        )
        save_checkpoint(
            path,
            {
                "format": NATIVE_FORMAT,
                "step": int(state.step),
                "variables": {"params": fold_weight_norm(state.gen_params)},
            },
        )
        return
    if fmt != "pickle":
        raise ValueError(f"unknown checkpoint_format {fmt!r}")
    save_checkpoint(
        path,
        {
            "format": NATIVE_FORMAT,
            "step": int(state.step),
            "variables": {"params": fold_weight_norm(state.gen_params)},
            "raw": raw,
        },
    )


def restore_vocoder_state(
    ckpt_path: Path, template: GanState, fmt: str = "pickle"
) -> Optional[GanState]:
    """Load a resumable GAN state (step, params, optimizer, spectral u,
    rng) in either checkpoint format.  Returns None when no checkpoint
    exists.  The rng is restored so a resumed run continues the exact
    stochastic stream instead of replaying a fresh one."""
    if fmt == "orbax":
        from viettts_tpu.train.checkpoint import load_checkpoint_orbax

        tpl = {
            "step": np.asarray(0, np.int32),
            "raw": {
                "gen_params": template.gen_params,
                "disc_params": template.disc_params,
                "spectral": template.spectral,
                "gen_opt": template.gen_opt,
                "disc_opt": template.disc_opt,
                "rng": template.rng,
            },
        }
        dic = load_checkpoint_orbax(_orbax_dir(ckpt_path), tpl)
        if dic is None:
            return None
        raw = dic["raw"]
        step = int(dic["step"])
    else:
        dic = load_checkpoint(ckpt_path)
        if dic is None or "raw" not in dic:
            return None
        raw = dic["raw"]
        step = int(dic["step"])
    return GanState(
        step=jnp.asarray(step, jnp.int32),
        gen_params=jax.tree.map(jnp.asarray, raw["gen_params"]),
        disc_params=jax.tree.map(jnp.asarray, raw["disc_params"]),
        spectral=jax.tree.map(jnp.asarray, raw.get("spectral", {})),
        gen_opt=jax.tree.map(jnp.asarray, raw["gen_opt"]),
        disc_opt=jax.tree.map(jnp.asarray, raw["disc_opt"]),
        rng=(
            jnp.asarray(raw["rng"])
            if raw.get("rng") is not None
            else template.rng
        ),
    )


def _load_disc_init(path: Path, template: GanState) -> GanState:
    """Warm-start the discriminators (and MSD spectral u) from a converted
    upstream ``do_*`` checkpoint (tools/convert_torch_hifigan.py
    --do-file), matching the reference finetune recipe of resuming
    MPD+MSD alongside the generator (README.md:88-100).  Optimizer
    moments start fresh (see convert_do_file).  Tree structures are
    checked against the cold init so a config/checkpoint mismatch fails
    loudly instead of training against silently-wrong discriminators."""
    dic = load_checkpoint(path)
    if dic is None or "disc_params" not in dic:
        raise ValueError(f"{path} is not a discriminator-init checkpoint")
    disc_params = jax.tree.map(jnp.asarray, dic["disc_params"])
    spectral = jax.tree.map(jnp.asarray, dic.get("spectral", {}))
    for name, got, want in (
        ("disc_params", disc_params, template.disc_params),
        ("spectral", spectral, template.spectral),
    ):
        got_s = jax.tree.structure(got)
        want_s = jax.tree.structure(want)
        if got_s != want_s:
            raise ValueError(
                f"--disc-init {name} tree does not match the configured "
                f"discriminators: {got_s} vs {want_s}"
            )
        mismatched = [
            f"{jax.tree_util.keystr(kp)}: {g.shape} vs {w.shape}"
            for (kp, g), w in zip(
                jax.tree_util.tree_flatten_with_path(got)[0],
                jax.tree.leaves(want),
            )
            if g.shape != w.shape
        ]
        if mismatched:
            raise ValueError(
                f"--disc-init {name} shapes mismatch: {mismatched[:5]}"
            )
    print(f"Warm-starting discriminators from {path}")
    return template._replace(disc_params=disc_params, spectral=spectral)


def train(
    cfg: Config = Config(),
    wav_dir: Optional[Path] = None,
    gta_dir: Optional[Path] = None,
    num_steps: Optional[int] = None,
    log_every: int = 1000,
    on_metrics=None,
    disc_init: Optional[Path] = None,
    on_state=None,
    on_state_every: int = 0,
) -> GanState:
    """``on_state(step, state)``, called every ``on_state_every`` steps,
    gives callers periodic access to the live (replicated) GanState for
    validation-time metrics (e.g. MCD tracking in scripts/validate_gan.py)
    without the trainer hard-coding any particular metric."""
    hcfg = cfg.hifigan
    hop = cfg.dsp.hop_length
    mesh = mesh_for_batch(cfg.train.batch_size, cfg.train.num_devices)
    mel_fn = LogMelSpectrogram(cfg.dsp)

    # bf16 compute dtype under mixed precision; master params stay f32
    # (flax param dtype is set by the initializers, which return f32).
    gen_dtype = jnp.bfloat16 if cfg.train.mixed_precision else jnp.float32
    generator = Generator(hcfg, use_wn=True, dtype=gen_dtype)
    mpd = MultiPeriodDiscriminator(
        periods=hcfg.mpd_periods, base_channels=hcfg.mpd_base_channels
    )
    msd = MultiScaleDiscriminator(
        num_scales=hcfg.msd_scales, base_channels=hcfg.msd_base_channels
    )

    ds = VocoderDataset(
        wav_dir or cfg.data_dir,
        hcfg.segment_size,
        hop,
        gta_dir=gta_dir,
        sample_rate=cfg.dsp.sample_rate,
    )
    init_data = ds.batches(cfg.train.batch_size, seed=cfg.train.seed)

    # Upstream hifi-gan decays the LR by ``lr_decay`` once per EPOCH
    # (train.py scheduler.step()); one epoch = one pass over the dataset.
    # ``hcfg.lr_decay_steps`` overrides the interval for small corpora
    # where per-epoch decay would collapse the LR (see HifiGanConfig).
    steps_per_epoch = hcfg.lr_decay_steps or max(
        1, len(ds) // cfg.train.batch_size
    )
    lr = optax.exponential_decay(
        hcfg.learning_rate, steps_per_epoch, hcfg.lr_decay, staircase=True
    )
    gen_tx = optax.adamw(lr, b1=hcfg.adam_b1, b2=hcfg.adam_b2)
    disc_tx = optax.adamw(lr, b1=hcfg.adam_b1, b2=hcfg.adam_b2)

    rng = jax.random.PRNGKey(cfg.train.seed)
    mel0, audio0 = next(init_data)
    cond0 = mel0 if mel0 is not None else np.asarray(mel_fn(jnp.asarray(audio0)))
    k1, k2, k3 = jax.random.split(rng, 3)
    gen_params = generator.init(k1, jnp.asarray(cond0))["params"]
    y0 = jnp.asarray(audio0)[..., None]
    msd_vars = msd.init(k3, y0, y0)
    disc_params = {
        "mpd": mpd.init(k2, y0, y0)["params"],
        "msd": msd_vars["params"],
    }
    spectral = msd_vars.get("spectral", {})
    state = GanState(
        step=jnp.asarray(0, jnp.int32),
        gen_params=gen_params,
        disc_params=disc_params,
        spectral=spectral,
        gen_opt=gen_tx.init(gen_params),
        disc_opt=disc_tx.init(disc_params),
        rng=rng,
    )

    ckpt_path = Path(cfg.ckpt_dir) / "hifigan_latest_ckpt.pickle"
    ckpt_fmt = cfg.train.checkpoint_format
    restored = restore_vocoder_state(ckpt_path, state, ckpt_fmt)
    if restored is not None:
        print(
            f"Resuming vocoder from {ckpt_path} at step {int(restored.step)}"
        )
        state = restored
    elif disc_init is not None:
        # fresh run (typically GTA finetuning): warm-start MPD/MSD from
        # the converted upstream do_* checkpoint; an in-progress run's
        # own resume state takes precedence above
        state = _load_disc_init(disc_init, state)
    start_step = int(state.step)
    # Advance the crop stream past what the run already consumed: a fresh
    # ``batches(seed=seed)`` would re-serve the same early crops after
    # every resume (the step count seeds a distinct but deterministic
    # continuation stream).
    data = ds.batches(
        cfg.train.batch_size, seed=cfg.train.seed + start_step
    )
    state = replicate(state, mesh)

    step_fn = make_gan_step(cfg, generator, mpd, msd, gen_tx, disc_tx, mel_fn)
    num_steps = num_steps or cfg.train.num_training_steps

    avg = {k: MetricAverager(log_every) for k in
           ("disc_loss", "gen_loss", "mel_l1")}
    t0 = time.time()
    done = 0
    # Track the step on the host: fetching ``int(state.step)`` every
    # iteration is a blocking device->host sync that serializes dispatch
    # (measured 0.5 vs 8.3 steps/s on the tunneled v5e — the device-side
    # step cost is 16x smaller than the sync stall it hid behind).
    step = int(state.step)
    from viettts_tpu.utils.profiling import trace

    def sharded_batches():
        """Host batches placed on the mesh one step ahead of use, so the
        host->HBM upload RPC overlaps the previous step's compute
        (device_put is async; consuming it inline would serialize the
        transfer with dispatch on the tunneled runtime)."""
        from collections import deque

        queue = deque()
        for mel_in, audio in data:
            queue.append((
                None if mel_in is None else shard_batch(mel_in, mesh),
                shard_batch(audio, mesh),
            ))
            if len(queue) >= 2:
                yield queue.popleft()
        while queue:  # flush if a finite iterator is exhausted
            yield queue.popleft()

    # Async checkpointing: the ~1 GB GAN state fetch + pickle stalls the
    # loop for tens of seconds when done inline (measured on the step-1000
    # save).  Instead the state is device-copied in ONE jitted dispatch —
    # the copy's buffers are not donated to the next step, so they stay
    # valid — and a background thread does the device->host fetch and the
    # atomic file write while training continues.
    import threading

    copy_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    ckpt_thread: list = [None]

    def save_async(st: GanState) -> None:
        if ckpt_thread[0] is not None:
            ckpt_thread[0].join()  # backpressure: one save in flight
        snap = copy_state(st)
        t = threading.Thread(
            target=save_vocoder_ckpt, args=(ckpt_path, snap, ckpt_fmt),
            daemon=True,
        )
        t.start()
        ckpt_thread[0] = t

    batches = sharded_batches()
    with trace():  # device trace when VIETTTS_PROFILE_DIR is set
        while step < num_steps:
            mel_in, audio = next(batches)
            state, metrics = step_fn(state, mel_in, audio)
            step += 1
            for k in avg:
                avg[k].add(metrics[k])
            if on_metrics is not None:
                on_metrics(step, metrics)
            done += 1
            if step % log_every == 0:
                sps = done / max(time.time() - t0, 1e-6)
                print(
                    f"step {step:>7d} | disc {avg['disc_loss'].mean():.3f}"
                    f" | gen {avg['gen_loss'].mean():.3f}"
                    f" | mel_l1 {avg['mel_l1'].mean():.4f} | {sps:.2f} steps/s"
                )
            if on_state is not None and on_state_every and (
                step % on_state_every == 0
            ):
                on_state(step, state)
            if step % cfg.train.ckpt_interval == 0:
                save_async(state)
    if ckpt_thread[0] is not None:
        ckpt_thread[0].join()
    save_vocoder_ckpt(ckpt_path, state, ckpt_fmt)
    return state


def main(argv=None):
    from argparse import ArgumentParser

    from viettts_tpu.config import apply_overrides

    parser = ArgumentParser(description="Train the HiFi-GAN vocoder")
    parser.add_argument("--wav-dir", type=Path, default=None)
    parser.add_argument(
        "--gta-dir", type=Path, default=None,
        help="GTA mel dir (tools/gta.py output) for finetuning",
    )
    parser.add_argument("--ckpt-dir", type=Path, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument(
        "--disc-init", type=Path, default=None,
        help="converted upstream do_* discriminator checkpoint "
             "(tools/convert_torch_hifigan.py --do-file) to warm-start "
             "MPD/MSD for GTA finetuning",
    )
    parser.add_argument("--set", action="append", default=[], metavar="K=V")
    args = parser.parse_args(argv)
    cfg = apply_overrides(Config(), args.set)
    if args.ckpt_dir:
        cfg = cfg.replace(ckpt_dir=args.ckpt_dir)
    Path(cfg.ckpt_dir).mkdir(parents=True, exist_ok=True)
    train(
        cfg, wav_dir=args.wav_dir, gta_dir=args.gta_dir,
        num_steps=args.steps, disc_init=args.disc_init,
    )


if __name__ == "__main__":
    main()
