"""Test environment: force CPU with an 8-device virtual mesh.

Must set env vars before the first `import jax` anywhere in the test
process (SURVEY.md §4 item 5: distributed tests without a cluster).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# f32 dots at full precision so kernel-vs-oracle tests are exact (the
# default emulates TPU bf16-pass matmuls even on CPU).
jax.config.update("jax_default_matmul_precision", "highest")
