"""Test harness config: CPU backend with 8 virtual devices + float64 support.

Multi-chip sharding is tested on a fake CPU mesh (the TPU analog of testing
multi-node collectives without a cluster, SURVEY.md section 4e); float64 is
enabled so power-flow parity tests can match the numpy oracle at 1e-8 like
pandapower's default tolerance.

Note: the JAX_PLATFORMS env var is pinned to the TPU tunnel by the outer
environment, so the CPU backend must be selected through jax.config.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
