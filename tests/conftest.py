"""Test configuration.

Forces the CPU backend (the axon TPU plugin otherwise grabs every op and
round-trips it over the network tunnel). Multi-device sharding tests spawn a
subprocess with ``--xla_force_host_platform_device_count=8`` (see
``tests/test_sharding.py``) so the main process keeps fast single-device
compiles — this box has one CPU core and XLA compile times dominate.
"""

import os
import sys

# NOTE: on this image the axon TPU plugin ignores JAX_PLATFORMS;
# JAX_PLATFORM_NAME does force the CPU backend.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache: compiles dominate test time on this
# single-core box; cache them across runs.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
