"""Test configuration: run everything on a virtual 8-device CPU mesh.

The platform must be chosen before the jax backend initialises, and the
host-platform device count must be set via XLA_FLAGS before that. x64 is
enabled so numerical parity checks against the float64 reference
implementation are meaningful.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The XLA CPU compiler segfaults after enough cumulative in-process
    compilation (observed: deterministic crashes in whatever test happens
    to compile ~170 programs into one process — the suite outgrew the
    limit as sampler kinds were added). Modules share few programs, so
    clearing per module caps the accumulation at negligible recompile
    cost."""
    yield
    import jax

    jax.clear_caches()
