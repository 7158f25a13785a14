"""Device selection policy.

XLA compilation for a new input shape can cost minutes on remote-compiled
TPU backends while the computation itself takes milliseconds; small texts
gain nothing from the TPU. Inputs below ``BWTB3M_SMALL_CPU_THRESHOLD``
symbols (default 2 Mi) therefore run on the CPU backend when one is
registered. Set the env var to 0 to force everything onto the default
device.
"""

from __future__ import annotations

import os
from contextlib import nullcontext

DEFAULT_THRESHOLD = 2 << 20


def small_input_threshold() -> int:
    try:
        return int(os.environ.get("BWTB3M_SMALL_CPU_THRESHOLD",
                                  str(DEFAULT_THRESHOLD)))
    except ValueError:
        return DEFAULT_THRESHOLD


def device_scope(n: int):
    """Context manager placing computation for an n-symbol problem."""
    import jax

    if n >= small_input_threshold():
        return nullcontext()
    try:
        default = jax.devices()[0]
        if default.platform == "cpu":
            return nullcontext()
        cpus = jax.devices("cpu")
    except RuntimeError:
        return nullcontext()
    if not cpus:
        return nullcontext()
    return jax.default_device(cpus[0])
