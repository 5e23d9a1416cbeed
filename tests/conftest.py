"""Test configuration: force an 8-device virtual CPU mesh (SURVEY.md §4.4).

Tests run on CPU so they are hermetic and so multi-chip sharding logic can
be exercised without a TPU pod; Pallas kernels run in interpret mode there
(each op's ``interpret`` default handles that). Real-chip validation is
done by ``scripts/tpu_smoke.py`` outside pytest.

NOTE: this environment's TPU plugin (axon) registers itself via
``sitecustomize`` and programmatically overrides ``JAX_PLATFORMS``, so the
env var alone does NOT stick — ``jax.config.update`` after import is
required. XLA_FLAGS must still be set before import for the virtual
device count.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
