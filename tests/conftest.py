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
