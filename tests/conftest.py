"""Test harness: run everything on a virtual 8-device CPU platform so
multi-device sharding paths are exercised without TPU hardware.

The environment's sitecustomize pre-imports jax and force-selects the
``axon`` single-TPU backend, so env vars alone are too late — we must
switch platforms through jax.config before any backend is initialized.
Set ``VIETTTS_TEST_TPU=1`` to run the suite on the real TPU instead.
"""

import os

if os.environ.get("VIETTTS_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import pytest

# ---------------------------------------------------------------------------
# Test tiers.  Marks are applied centrally from this table (measured wall
# times on the 8-vdev CPU mesh, `--durations` run of 2026-08-18) so the
# fast tier stays accurate without scattering decorators:
#
#   pytest -m "not slow"   fast tier, ~5 min — run while iterating
#   pytest tests/          full suite, ~35-40 min — CI-shard by file
#   pytest -m pallas       interpret-mode Pallas kernels inside jit
#
# `slow` = >~15 s each (XLA compiles of full pipelines/trainers dominate).
# An entry "module" marks the whole file; "module::prefix" marks tests
# whose name starts with the prefix.
# ---------------------------------------------------------------------------

_SLOW = {
    # whole modules (every test compiles real pipelines/trainers)
    "test_lifecycle": None,
    "test_dp_equivalence": None,
    "test_multihost": None,
    "test_checkpoint_parity": None,
    # per-test
    "test_pipeline": (
        "test_synthesize", "test_silence_clamping", "test_bucketing",
        "test_warmup", "test_cli", "test_long_form", "test_public_vocode",
        "test_decode_mel_sub_batch", "test_batch_size_bucketing",
        "test_mesh_", "test_streaming", "test_single_dispatch",
        "test_warmup_covers_silence",
    ),
    "test_serve": ("test_http_server_end_to_end", "test_http_streaming"),
    "test_tools": (
        "test_vocoder_gan", "test_gta_export",
        "test_torch_discriminator_conversion", "test_disc_init",
    ),
    "test_trainers": (
        "test_acoustic_", "test_duration_trainer", "test_duration_loss",
    ),
    "test_models": ("test_discriminators_run", "test_generator_upsamples"),
    "test_reference_parity": (
        "test_text2mel", "test_hifigan_generator", "test_acoustic_",
        "test_duration_parity",
    ),
    "test_mrf": ("test_fused_mrf_exact", "test_fused_generator"),
    "test_ar_decoder": ("test_ar_decode_matches_scan",),
}

_PALLAS = {
    "test_mrf": None,
    "test_ar_decoder": None,
    # the real-Synthesizer fixtures route through interpret-mode kernels
    "test_pipeline": (
        "test_synthesize", "test_silence_clamping", "test_bucketing",
        "test_warmup", "test_cli", "test_long_form", "test_public_vocode",
        "test_decode_mel_sub_batch", "test_batch_size_bucketing",
        "test_mesh_sharded_serving_pallas", "test_streaming",
    ),
    "test_serve": ("test_http_server_end_to_end", "test_http_streaming"),
}


def _matches(table, module: str, name: str) -> bool:
    prefixes = table.get(module, ())
    if prefixes is None:
        return True
    return any(name.startswith(p) for p in prefixes or ())


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.module.__name__.rsplit(".", 1)[-1]
        if _matches(_SLOW, module, item.name):
            item.add_marker(pytest.mark.slow)
        if _matches(_PALLAS, module, item.name):
            item.add_marker(pytest.mark.pallas)
