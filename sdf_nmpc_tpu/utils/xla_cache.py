"""Persistent XLA compilation cache (the reference's AOT-codegen analogue).

The reference pays its compile cost once at build time (acados C codegen
cached under ~/.cache, reference ocp.py:28-29, __init__.py:16-19); the JAX
design pays it at first trace instead.  Through this container's TPU tunnel a
cold compile of the batched solver costs minutes, so every entry point
(bench.py, scripts/*, __graft_entry__) enables JAX's persistent compilation
cache: identical programs become disk hits across processes.
"""

from __future__ import annotations


def enable_persistent_cache() -> None:
    """Idempotent; call after `import jax`, before the first compilation."""
    import jax

    from .. import cache_dir

    try:
        if jax.config.jax_compilation_cache_dir:  # already configured
            return
        jax.config.update("jax_compilation_cache_dir", str(cache_dir() / "xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only -- never fail an entry point
