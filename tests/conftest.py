"""Test configuration: run all tests on CPU with 8 virtual devices.

Mirrors the reference's decomposition-invariance strategy
(tests/compare_checksums.py in ecTrans): multi-"chip" correctness is tested
on one host by giving XLA 8 virtual CPU devices, so sharded transforms can be
checked against single-device results without TPU pod hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep unit tests hermetic: never touch the user's on-disk legpol cache
os.environ.setdefault("ECTRANS_TPU_LEGPOL_DIR", "")

import jax

# sitecustomize may have imported jax already (pinning jax_platforms from the
# env); update the live config so tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
