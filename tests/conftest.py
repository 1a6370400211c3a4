"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip shard_map paths are exercised hostless (SURVEY.md §4.4) and tests
never require a real TPU.

Note: this environment pre-imports jax via sitecustomize (JAX_PLATFORMS=axon),
so the env var alone is ignored — we must go through jax.config. XLA_FLAGS
still applies because backends initialize lazily at first device query.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
