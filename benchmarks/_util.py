"""Shared benchmark helpers."""

import time

import jax


def retry(fn, *args, attempts=3, **kwargs):
    """The remote-TPU relay intermittently fails device transfers with
    retryable backend errors (docs/PERF.md); retry a transient failure
    instead of voiding the whole benchmark run."""
    for i in range(attempts):
        try:
            return fn(*args, **kwargs)
        except jax.errors.JaxRuntimeError as exc:
            if i == attempts - 1:
                raise
            print(f'transient backend error ({exc}); retrying', flush=True)
            time.sleep(5)
