"""Test configuration: force JAX onto the host CPU with a virtual 8-device mesh.

Correctness tests need native float64 (the TPU emulates it) and the sharding
tests need multiple devices, so all tests run on the CPU backend with
8 virtual devices, mirroring how the driver dry-runs the multi-chip path.
"""

import os

# The TPU tier (pytest -m tpu with MFV2D_TPU_TESTS=1) keeps the real
# accelerator platform; everything else runs on the host CPU with a virtual
# 8-device mesh.
_TPU_TIER = os.environ.get("MFV2D_TPU_TESTS") == "1"

if not _TPU_TIER:
    # The sandbox presets JAX_PLATFORMS=axon (the TPU tunnel); tests must
    # run on the host CPU, so override unconditionally.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_TIER:
    # The sandbox sitecustomize imports jax before this file runs, so the
    # env vars above may be too late; the config update works post-import.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
