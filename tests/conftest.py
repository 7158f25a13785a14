"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Mirrors the rebuild's multi-chip testing strategy (SURVEY.md section 4 note):
the multi-device code paths run on a virtual CPU mesh and assert bit-equality
against the single-device path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
