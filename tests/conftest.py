"""Test environment: force CPU with an 8-device virtual mesh.

Must set env vars before the first `import jax` anywhere in the test
process (SURVEY.md §4 item 5: distributed tests without a cluster).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the driver env
# pins JAX_PLATFORMS to the TPU tunnel, but the test suite runs on the
# virtual 8-device CPU mesh (SURVEY.md §4 item 5)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

# The driver's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon already set, so the env override above can be too
# late — update the live config as well (backends are created lazily,
# so this still wins as long as no test ran device code yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Async CPU dispatch exhibits rare cross-program buffer races with the
# virtual multi-device client (flaky ~0.1-magnitude logit corruption
# dependent on heap history); synchronous dispatch makes the suite
# deterministic. TPU execution is unaffected.
jax.config.update("jax_cpu_enable_async_dispatch", False)

jax.config.update("jax_enable_x64", False)
# f32 dots at full precision so kernel-vs-oracle tests are exact (the
# default emulates TPU bf16-pass matmuls even on CPU).
jax.config.update("jax_default_matmul_precision", "highest")
