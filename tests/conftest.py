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

# The axon sitecustomize may have imported jax and registered the TPU plugin
# before this conftest runs; env vars alone are then too late.  Force the
# platform through jax.config (the XLA_FLAGS above are still read when the
# CPU client is created, which hasn't happened yet at collection time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

FIXTURES = "/root/reference/tests"


def fixture(name: str) -> str:
    return os.path.join(FIXTURES, name)


def tree_bytes(root):
    """{relative path: file bytes} of a directory tree — the byte-identity
    comparator shared by the round-trip tests."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            with open(p, "rb") as f:
                out[os.path.relpath(p, root)] = f.read()
    return out
