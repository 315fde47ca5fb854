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


def timed_loop(body, steps, sync, loops=2):
    """Run ``body(i)`` ``steps`` times per loop, ``sync()`` at loop end;
    returns the elapsed seconds of the LAST loop (the first is discarded —
    remote-TPU relays run a slow path right after compilation)."""
    elapsed = None
    for _ in range(loops):
        t0 = time.perf_counter()
        for i in range(steps):
            body(i)
        sync()
        elapsed = time.perf_counter() - t0
    return elapsed
