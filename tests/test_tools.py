"""Tool tests: GTA export, silence zeroing, torch HiFi-GAN conversion, and a
short vocoder GAN training run."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viettts_tpu.config import (
    AcousticModelConfig,
    Config,
    DataConfig,
    HifiGanConfig,
    TrainConfig,
)
from viettts_tpu.data.audio import read_wav, write_wav
from viettts_tpu.train.checkpoint import NATIVE_FORMAT, save_checkpoint

from tests.test_trainers import TG_TEMPLATE, SR


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    for i in range(6):
        (d / f"utt{i:02d}.TextGrid").write_text(TG_TEMPLATE)
        rng = np.random.RandomState(i)
        wav = (rng.randn(SR) * 2000).astype(np.int16)
        write_wav(d / f"utt{i:02d}.wav", wav, SR)
    return d


def _tiny_cfg(corpus, ckpt_dir):
    return Config(
        acoustic=AcousticModelConfig(
            encoder_dim=16, decoder_dim=16, prenet_dim=8, postnet_dim=8
        ),
        hifigan=HifiGanConfig(
            upsample_initial_channel=16,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
            segment_size=512,
            mpd_periods=(2, 3),
            mpd_base_channels=4,
            msd_scales=1,
            msd_base_channels=16,
        ),
        data=DataConfig(max_phoneme_seq_len=16, max_wave_len=SR),
        train=TrainConfig(batch_size=4, num_training_steps=2),
        ckpt_dir=ckpt_dir,
        data_dir=corpus,
    )


def test_zero_silence_tool(corpus, tmp_path):
    from viettts_tpu.tools.zero_silence_segments import main

    out = tmp_path / "zeroed"
    main(["-i", str(corpus), "-o", str(out)])
    wavs = sorted(out.glob("*.wav"))
    assert len(wavs) == 6
    sr, y = read_wav(wavs[0])
    # sil segments: [0, 0.2) and [0.7, 1.0)
    assert np.all(y[: int(0.2 * SR) - 1] == 0)
    assert np.all(y[int(0.7 * SR) + 1 :] == 0)
    assert np.any(y[int(0.25 * SR) : int(0.65 * SR)] != 0)


def test_gta_export(corpus, tmp_path):
    from viettts_tpu.models import AcousticModel
    from viettts_tpu.tools.gta import generate_gta
    from viettts_tpu.types import AcousticBatch

    cfg = _tiny_cfg(corpus, tmp_path)
    # random-init acoustic checkpoint
    model = AcousticModel(cfg.acoustic)
    ab = AcousticBatch(
        jnp.zeros((1, 16), jnp.int32),
        jnp.asarray([16]),
        jnp.ones((1, 16)),
        None,
        None,
        jnp.zeros((1, 8, 80)),
    )
    variables = model.init(
        {
            "params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "prenet": jax.random.PRNGKey(2),
            "zoneout": jax.random.PRNGKey(3),
        },
        ab,
        train=True,
    )
    ckpt = tmp_path / "acoustic_latest_ckpt.pickle"
    save_checkpoint(
        ckpt,
        {
            "format": NATIVE_FORMAT,
            "step": 0,
            "variables": {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            },
        },
    )
    out = tmp_path / "gta"
    n = generate_gta(out, cfg, acoustic_ckpt=ckpt)
    assert n == 6
    mels = sorted(out.glob("*.npy"))
    assert len(mels) == 6
    mel = np.load(mels[0])
    assert mel.shape[0] == 80  # [mel_dim, T]
    assert mel.shape[1] == SR // 256  # true frame count
    assert np.all(np.isfinite(mel))


def test_torch_hifigan_conversion():
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    from torch.nn.utils import weight_norm

    from viettts_tpu.models import Generator
    from viettts_tpu.tools.convert_torch_hifigan import convert_state_dict

    cfg = HifiGanConfig(
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=8,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),),
        mel_dim=6,
    )

    class TorchResBlock(nn.Module):
        def __init__(self, ch, k, dil):
            super().__init__()
            self.convs1 = nn.ModuleList(
                [
                    weight_norm(
                        nn.Conv1d(ch, ch, k, dilation=d, padding=(k * d - d) // 2)
                    )
                    for d in dil
                ]
            )
            self.convs2 = nn.ModuleList(
                [
                    weight_norm(nn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
                    for _ in dil
                ]
            )

        def forward(self, x):
            import torch.nn.functional as F

            for c1, c2 in zip(self.convs1, self.convs2):
                xt = c1(F.leaky_relu(x, 0.1))
                xt = c2(F.leaky_relu(xt, 0.1))
                x = xt + x
            return x

    class TorchGen(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pre = weight_norm(nn.Conv1d(6, 8, 7, padding=3))
            self.ups = nn.ModuleList(
                [
                    weight_norm(
                        nn.ConvTranspose1d(
                            8 // (2**i), 8 // (2 ** (i + 1)), k, u,
                            padding=(k - u) // 2,
                        )
                    )
                    for i, (u, k) in enumerate(zip((2, 2), (4, 4)))
                ]
            )
            self.resblocks = nn.ModuleList(
                [
                    TorchResBlock(8 // (2 ** (i + 1)), 3, (1, 3, 5))
                    for i in range(2)
                ]
            )
            self.conv_post = weight_norm(nn.Conv1d(2, 1, 7, padding=3))

        def forward(self, x):
            import torch.nn.functional as F

            x = self.conv_pre(x)
            for i in range(2):
                x = F.leaky_relu(x, 0.1)
                x = self.ups[i](x)
                x = self.resblocks[i](x)
            x = F.leaky_relu(x)
            return torch.tanh(self.conv_post(x))

    torch.manual_seed(0)
    tg = TorchGen().eval()
    mel = np.random.RandomState(0).randn(2, 9, 6).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(np.transpose(mel, (0, 2, 1))))
    want = np.transpose(want.numpy(), (0, 2, 1))

    variables = convert_state_dict(tg.state_dict())
    got = Generator(cfg).apply(variables, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_torch_discriminator_conversion():
    """Converted upstream do_* discriminators (MPD weight-norm Conv2d, MSD
    spectral-norm scale 0 + weight-norm scales 1-2) match the JAX
    discriminators' forward outputs — the warm-start contract for GTA
    finetuning (reference torch_model.py:221-380, README.md:88-100)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F
    from torch.nn.utils import spectral_norm, weight_norm

    from viettts_tpu.models.hifigan import (
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )
    from viettts_tpu.tools.convert_torch_hifigan import convert_discriminators

    periods = (2, 3)
    num_scales = 2

    class TorchDiscP(nn.Module):
        # upstream DiscriminatorP at 1/8 channel width
        def __init__(self, period):
            super().__init__()
            self.period = period
            chans = [(1, 4), (4, 16), (16, 64), (64, 128), (128, 128)]
            self.convs = nn.ModuleList(
                [
                    weight_norm(
                        nn.Conv2d(
                            i, o, (5, 1),
                            (3, 1) if j < 4 else 1,
                            padding=(2, 0),
                        )
                    )
                    for j, (i, o) in enumerate(chans)
                ]
            )
            self.conv_post = weight_norm(
                nn.Conv2d(128, 1, (3, 1), 1, padding=(1, 0))
            )

        def forward(self, x):
            b, c, t = x.shape
            if t % self.period:
                x = F.pad(x, (0, self.period - t % self.period), "reflect")
                t = x.shape[-1]
            x = x.view(b, c, t // self.period, self.period)
            for layer in self.convs:
                x = F.leaky_relu(layer(x), 0.1)
            x = self.conv_post(x)
            return torch.flatten(x, 1, -1)

    class TorchDiscS(nn.Module):
        # upstream DiscriminatorS at 1/8 channel width
        def __init__(self, use_sn):
            super().__init__()
            norm = spectral_norm if use_sn else weight_norm
            specs = [
                (1, 16, 15, 1, 1, 7),
                (16, 16, 41, 2, 4, 20),
                (16, 32, 41, 2, 16, 20),
                (32, 64, 41, 4, 16, 20),
                (64, 128, 41, 4, 16, 20),
                (128, 128, 41, 1, 16, 20),
                (128, 128, 5, 1, 1, 2),
            ]
            self.convs = nn.ModuleList(
                [
                    norm(nn.Conv1d(i, o, k, s, groups=g, padding=p))
                    for (i, o, k, s, g, p) in specs
                ]
            )
            self.conv_post = norm(nn.Conv1d(128, 1, 3, 1, padding=1))

        def forward(self, x):
            for layer in self.convs:
                x = F.leaky_relu(layer(x), 0.1)
            x = self.conv_post(x)
            return torch.flatten(x, 1, -1)

    class TorchMPD(nn.Module):
        def __init__(self):
            super().__init__()
            self.discriminators = nn.ModuleList(
                [TorchDiscP(p) for p in periods]
            )

    class TorchMSD(nn.Module):
        def __init__(self):
            super().__init__()
            self.discriminators = nn.ModuleList(
                [TorchDiscS(i == 0) for i in range(num_scales)]
            )

    torch.manual_seed(1)
    tmpd, tmsd = TorchMPD(), TorchMSD()
    # snapshot BEFORE any forward: spectral_norm's train-mode forward
    # mutates weight_u in place (state_dict() returns live references),
    # and both frameworks must power-iterate from the same stored u
    import copy

    mpd_sd = copy.deepcopy(tmpd.state_dict())
    msd_sd = copy.deepcopy(tmsd.state_dict())
    wave = np.random.RandomState(0).randn(2, 1024).astype(np.float32) * 0.1
    tw = torch.from_numpy(wave[:, None, :])
    with torch.no_grad():
        # train-mode forward: spectral_norm runs one power iteration from
        # the stored u, exactly what the JAX forward does from the
        # converted u
        want_p = [d(tw).numpy() for d in tmpd.discriminators]
        want_s = []
        x = tw
        for i, d in enumerate(tmsd.discriminators):
            if i:
                x = F.avg_pool1d(x, 4, 2, padding=2)
            want_s.append(d(x).numpy())

    disc_params, spectral_tree = convert_discriminators(
        mpd_sd, msd_sd, periods=periods, num_scales=num_scales,
    )

    jw = jnp.asarray(wave)[..., None]
    mpd = MultiPeriodDiscriminator(periods=periods, base_channels=4)
    got_p, _, _, _ = mpd.apply({"params": disc_params["mpd"]}, jw, jw)
    for got, want in zip(got_p, want_p):
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    msd = MultiScaleDiscriminator(num_scales=num_scales, base_channels=16)
    got_s, _, _, _ = msd.apply(
        {"params": disc_params["msd"], "spectral": spectral_tree}, jw, jw
    )
    for got, want in zip(got_s, want_s):
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # structure matches a cold init (what --disc-init validates against)
    cold = msd.init(jax.random.PRNGKey(0), jw, jw)
    assert jax.tree.structure(cold["params"]) == jax.tree.structure(
        disc_params["msd"]
    )
    assert jax.tree.structure(cold["spectral"]) == jax.tree.structure(
        spectral_tree
    )


def test_disc_init_warm_start(corpus, tmp_path):
    """train(disc_init=...) loads converted discriminators into the fresh
    GanState (and rejects mismatched trees loudly)."""
    from viettts_tpu.models.hifigan import (
        MultiPeriodDiscriminator,
        MultiScaleDiscriminator,
    )
    from viettts_tpu.train import hifigan as htrain

    cfg = _tiny_cfg(corpus, tmp_path)
    h = cfg.hifigan
    # build a donor state matching the configured discriminators
    wave = jnp.zeros((1, h.segment_size, 1))
    mpd = MultiPeriodDiscriminator(
        periods=h.mpd_periods, base_channels=h.mpd_base_channels
    )
    msd = MultiScaleDiscriminator(
        num_scales=h.msd_scales, base_channels=h.msd_base_channels
    )
    msd_vars = msd.init(jax.random.PRNGKey(7), wave, wave)
    donor = {
        "mpd": mpd.init(jax.random.PRNGKey(8), wave, wave)["params"],
        "msd": msd_vars["params"],
    }
    init_path = tmp_path / "disc_init.pickle"
    save_checkpoint(
        init_path,
        {
            "format": NATIVE_FORMAT,
            "step": 1140000,
            "disc_params": donor,
            "spectral": msd_vars.get("spectral", {}),
        },
    )
    state = htrain.train(
        cfg, wav_dir=corpus, num_steps=1, log_every=1, disc_init=init_path
    )
    assert int(state.step) == 1
    # the loaded params were the donor's, not a cold init: compare one leaf
    # against the donor after the single update (they started equal, so
    # they stay close; a cold init differs at random-init scale)
    got = state.disc_params["mpd"][f"disc_p{h.mpd_periods[0]}"]["conv_0"]["v"]
    want = donor["mpd"][f"disc_p{h.mpd_periods[0]}"]["conv_0"]["v"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-2
    )

    # mismatched tree -> loud failure
    bad_path = tmp_path / "disc_bad.pickle"
    save_checkpoint(
        bad_path,
        {
            "format": NATIVE_FORMAT,
            "step": 0,
            "disc_params": {"mpd": {}, "msd": {}},
            "spectral": {},
        },
    )
    (tmp_path / "hifigan_latest_ckpt.pickle").unlink()
    with pytest.raises(ValueError, match="disc_params tree"):
        htrain.train(
            cfg, wav_dir=corpus, num_steps=1, log_every=1,
            disc_init=bad_path,
        )


def test_vocoder_gan_training_runs(corpus, tmp_path):
    from viettts_tpu.train import hifigan as htrain

    cfg = _tiny_cfg(corpus, tmp_path)
    state = htrain.train(cfg, wav_dir=corpus, num_steps=2, log_every=1)
    assert int(state.step) == 2
    ckpt = tmp_path / "hifigan_latest_ckpt.pickle"
    assert ckpt.exists()

    # the folded checkpoint drives inference through the auto-loader
    from viettts_tpu.models import Generator
    from viettts_tpu.train.checkpoint import load_variables

    variables = load_variables(ckpt, "hifigan")
    gen = Generator(cfg.hifigan, use_wn=False)
    wav = gen.apply(variables, jnp.zeros((1, 8, 80)))
    assert wav.shape == (1, 8 * 256, 1)
    assert bool(jnp.isfinite(wav).all())


def test_vocoder_gan_training_mixed_precision(corpus, tmp_path):
    """bf16 GAN step (train.mixed_precision): runs, finite losses, f32
    master params preserved, and the first-step losses stay close to the
    f32 step's (same init, same batch)."""
    import dataclasses

    from viettts_tpu.train import hifigan as htrain

    cfg = _tiny_cfg(corpus, tmp_path / "f32")
    losses = {}
    for mixed, ckpt_dir in ((False, tmp_path / "f32"), (True, tmp_path / "bf16")):
        ckpt_dir.mkdir(exist_ok=True)
        c = dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, mixed_precision=mixed),
            ckpt_dir=ckpt_dir,
        )
        got = {}
        state = htrain.train(
            c, wav_dir=corpus, num_steps=1, log_every=1,
            on_metrics=lambda step, m, got=got: got.update(
                {k: float(m[k]) for k in ("disc_loss", "gen_loss", "mel_l1")}
            ),
        )
        assert all(np.isfinite(v) for v in got.values()), got
        # master params stay f32 under mixed precision
        leaf = jax.tree.leaves(state.gen_params)[0]
        assert leaf.dtype == jnp.float32
        losses[mixed] = got

    for k in losses[False]:
        a, b = losses[False][k], losses[True][k]
        assert abs(a - b) / max(abs(a), 1e-6) < 0.1, (k, a, b)


def test_vocoder_gan_async_checkpoint_and_resume(corpus, tmp_path):
    """In-loop checkpoints are written by the async path (device-copied
    state, background write) and training resumes from them."""
    import dataclasses

    from viettts_tpu.train import hifigan as htrain
    from viettts_tpu.train.checkpoint import load_checkpoint

    cfg = _tiny_cfg(corpus, tmp_path)
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, num_training_steps=3, ckpt_interval=1
        )
    )
    state = htrain.train(cfg, wav_dir=corpus, num_steps=3, log_every=10)
    assert int(state.step) == 3
    ckpt = tmp_path / "hifigan_latest_ckpt.pickle"
    dic = load_checkpoint(ckpt)
    assert dic["step"] == 3 and "raw" in dic

    # resume: continues from step 3, not from scratch
    state2 = htrain.train(cfg, wav_dir=corpus, num_steps=5, log_every=10)
    assert int(state2.step) == 5
