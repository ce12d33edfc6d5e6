"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes a backend (see SURVEY.md §4's
distributed-test strategy).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the machine may expose a TPU
# fail hub lookups instantly instead of 5 DNS-retry rounds (~1 min each);
# dep-gated metrics must skip, not stall, on this air-gapped host
os.environ.setdefault("HF_HUB_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin ignores the env var; force the platform via config too
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
