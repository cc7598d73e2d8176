import os

# Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
# paths compile and execute without TPU hardware.  The environment pre-seeds
# jax_platforms to "axon,cpu" (TPU tunnel plugin), so the env var alone is
# not enough — override the config before any backend initializes.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
