"""Persistent XLA compilation cache.

Beyond-parity (the reference recompiles every process — torch/cuDNN have no
cross-process program cache to manage): every jitted program an
``Experiment`` compiles is written to an on-disk cache and reused by later
processes.  On TPU the first compile of a train step is expensive (minutes
for the big parity configs on the remote-relay harness), and production
workflows re-run the same config many times — restarts, eval-only passes,
sweeps over data — paying the full compile each time without this.

The cache is keyed by XLA on the full (HLO, compile options, backend
version) fingerprint, so it is always safe: a config/model/sharding change
misses and compiles fresh.  Enabled by default by the engine
(``train.compilation_cache: path | True | False`` / CLI
``--compilation-cache DIR|off``).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Union

import jax

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser('~'), '.cache', 'single_shot_detection_tpu', 'xla')


def enable_compilation_cache(
        cache_dir: Union[str, bool, None] = True,
        min_compile_time_secs: Optional[float] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    ``cache_dir``: ``True``/``None`` → the default user-cache path, a string
    → that path (``'off'``/``''`` disable), ``False`` → disable.  Returns the
    resolved directory (``None`` when disabled).  Idempotent; safe to call
    before or after backend initialization.

    ``min_compile_time_secs``: only programs whose compile took at least
    this long are persisted (JAX's default of 1 s skips throwaway
    micro-jits; tests pass 0 to cache everything).
    """
    if cache_dir is True or cache_dir is None:
        resolved: Optional[str] = DEFAULT_CACHE_DIR
    elif cache_dir is False or cache_dir in ('off', ''):
        resolved = None
    else:
        resolved = os.path.expanduser(str(cache_dir))

    if resolved is not None:
        os.makedirs(resolved, exist_ok=True)
    if jax.config.jax_compilation_cache_dir != resolved:
        # JAX binds the cache backend to the directory at FIRST use and
        # ignores later config updates; reset so the new location takes
        # effect mid-process (measured: without this, writes keep landing
        # in the old directory)
        from jax.experimental.compilation_cache import \
            compilation_cache as _cc
        _cc.reset_cache()
    jax.config.update('jax_compilation_cache_dir', resolved)
    if min_compile_time_secs is not None:
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          float(min_compile_time_secs))
    if resolved is not None:
        logging.getLogger(__name__).debug(
            'persistent compilation cache: %s', resolved)
    return resolved
