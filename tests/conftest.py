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
