"""Enable JAX's persistent compilation cache reliably on this image.

The image's sitecustomize imports jax at interpreter start, so
`os.environ["JAX_COMPILATION_CACHE_DIR"] = ...` inside a script runs AFTER
jax has already bound its config from the environment — the setting is
silently ignored and every run pays a fresh compile (a full pipeline is
~10-20 min on the axon tunnel). The only reliable mechanism is
`jax.config.update` after import, same as the jax_platforms workaround in
tests/conftest.py.
"""

from __future__ import annotations

import jax


def enable_persistent_cache(path: str = "/root/.jax_cache") -> None:
    """Point jax at the on-disk compile cache (idempotent)."""
    if jax.config.jax_compilation_cache_dir != path:
        jax.config.update("jax_compilation_cache_dir", path)
    # default min compile time is 1s — keep: sub-second compiles are cheap
