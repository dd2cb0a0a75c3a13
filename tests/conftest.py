import os

# Tests always run on a virtual 8-device CPU mesh so sharding paths are
# exercised without TPU hardware; bench.py runs on the real chip.
#
# The harness presets JAX_PLATFORMS=axon (a TPU tunnel) and a sitecustomize
# module imports jax at interpreter start, so plain env setdefault is too
# late — override both the env and the already-imported jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
