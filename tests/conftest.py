"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh (the standard JAX mechanism
for testing multi-device sharding without hardware) BEFORE jax is
imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("COATI_TPU_ASSUME_YES", "1")

# This machine's site config force-registers the TPU plugin ("axon")
# ahead of JAX_PLATFORMS; jax.config.update is the reliable override.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


