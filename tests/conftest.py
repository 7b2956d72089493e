"""Test configuration: run on CPU with 8 virtual devices for mesh tests."""

import os

# force CPU: the axon TPU platform may be pre-selected in the environment,
# and TPU f64 decompositions are emulated (slow / reduced precision)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

EXAMPLES = "/root/reference/examples"


@pytest.fixture(scope="session")
def examples_dir():
    return EXAMPLES
