"""Test configuration: force an 8-device CPU mesh before JAX initializes.

The environment pins JAX_PLATFORMS=axon (single real TPU) at interpreter
startup; tests instead run on 8 virtual CPU devices so multi-chip sharding
is exercised without hardware — something the reference framework never had
(SURVEY.md §4).
"""

import os

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
