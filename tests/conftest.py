"""Test configuration: force an 8-device virtual CPU mesh (SURVEY.md §4.4).

Tests run on CPU so they are hermetic and so multi-chip sharding logic can
be exercised without a TPU pod; Pallas kernels run in interpret mode there
(each op's ``interpret`` default handles that). Real-chip validation is
done by ``scripts/tpu_smoke.py`` outside pytest.

NOTE: this environment's TPU plugin (axon) registers itself via
``sitecustomize`` and sets ``JAX_PLATFORMS=axon`` in the process env;
``gspn_tpu.__init__`` honors the env var at import, so the conftest must
pin the ENV VAR (not just ``jax.config``) to "cpu" before any gspn_tpu
import — otherwise the first test that imports the package flips the
platform back to the tunneled chip (and HANGS if the tunnel is down:
the axon backend init polls the relay forever). XLA_FLAGS must also be
set before jax import for the virtual device count.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # see module docstring

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
