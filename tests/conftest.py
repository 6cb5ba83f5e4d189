import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding
# compiles and executes without TPU hardware.  NOTE: the environment's
# sitecustomize imports jax and pins the TPU plugin before this file runs,
# so the env var alone is not enough — also update jax.config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
