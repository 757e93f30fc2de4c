"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md §4)."""
import os

# Hard-override: the ambient environment may point JAX at a remote TPU tunnel
# (JAX_PLATFORMS=axon); tests always run on the virtual CPU mesh. Set
# VIDEOGLAMM_TEST_TPU=1 to run the suite against real hardware instead.
if not os.environ.get("VIDEOGLAMM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if not os.environ.get("VIDEOGLAMM_TEST_TPU"):
    # The ambient sitecustomize may have force-registered a TPU PJRT plugin;
    # this config update (before backend init) wins.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def mesh8():
    from videoglamm_tpu.parallel import create_mesh
    return create_mesh(data=4, model=2)
