"""Platform selection helper for the example-app CLIs.

Some deployment environments register an accelerator PJRT plugin at
interpreter startup with config-level priority, which silently overrides the
``JAX_PLATFORMS`` environment variable. App entry points call
:func:`honor_jax_platforms_env` first so the conventional env var works as
users (and the test-suite's CLI-parity subprocesses) expect.
"""

from __future__ import annotations

import os

__all__ = ["honor_jax_platforms_env"]


def honor_jax_platforms_env() -> None:
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    import jax

    try:
        if jax.config.jax_platforms != platforms:
            jax.config.update("jax_platforms", platforms)
    except Exception:
        pass  # never block an app over platform plumbing
