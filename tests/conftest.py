"""Test harness config: force an 8-device virtual CPU mesh (SURVEY.md 4.4).

The session environment presets JAX_PLATFORMS=axon (a remote-TPU tunnel
whose sitecustomize re-registers the backend in every process and
overrides the env var), so selecting CPU must go through jax.config after
import, before any backend is initialized. Unit tests always run on the
local CPU backend; the TPU is exercised by bench.py and __graft_entry__.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
