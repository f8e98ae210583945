"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This is the multi-chip-without-a-cluster strategy from SURVEY.md §4: all
sharding tests run against `--xla_force_host_platform_device_count=8`,
while the real TPU chip is reserved for `bench.py`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
