"""Platform-selection helper.

This image's jax build registers the experimental 'axon' TPU plugin in a way
that overrides the ``JAX_PLATFORMS`` environment variable — the documented
env knob silently lands on the TPU anyway (tests/conftest.py works around the
same quirk). Only ``jax.config.update("jax_platforms", ...)`` sticks, so the
CLI drivers call :func:`honor_jax_platforms_env` before first device use to
make ``JAX_PLATFORMS=cpu python main.py ...`` behave as documented.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    value = os.environ.get("JAX_PLATFORMS")
    if value:
        import jax

        jax.config.update("jax_platforms", value)
