"""Utilities: logging, timers, profiling hooks."""

import contextlib
import signal


@contextlib.contextmanager
def time_limit(seconds: int):
    """SIGALRM-based hard time limit (reference utils/utils.py:297-307's
    task-timeout helper).  Raises TimeoutError when exceeded."""

    def handler(signum, frame):
        raise TimeoutError(f"Timed out after {seconds}s")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
