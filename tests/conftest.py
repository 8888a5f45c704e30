"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Real TPU hardware in this rig is a single chip behind the axon tunnel; tests
exercise multi-chip sharding on a virtual CPU mesh instead
(`--xla_force_host_platform_device_count`, as SURVEY.md §6 prescribes).
Clearing PALLAS_AXON_POOL_IPS disables the axon sitecustomize so
JAX_PLATFORMS=cpu takes effect.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

FIXTURES = "/root/reference/tests"


def fixture(name: str) -> str:
    return os.path.join(FIXTURES, name)
