"""Test configuration.

Forces the CPU backend (the axon TPU plugin otherwise grabs every op and
round-trips it over the network tunnel). Multi-device sharding tests spawn a
subprocess with ``--xla_force_host_platform_device_count=8`` (see
``tests/test_sharding.py``) so the main process keeps fast single-device
compiles — this box has one CPU core and XLA compile times dominate.
"""

import os
import sys

# The axon plugin (imported by sitecustomize at interpreter startup) reads
# the environment at import time, so env assignments here are too late to
# stop its registration — but backend SELECTION honors jax.config, so
# forcing jax_platforms below pins the suite to CPU. Without this the whole
# suite silently routes through the TPU tunnel (remote compiles, ~20x
# slower, and toy-parameter kernels hit real-hardware Mosaic limits).
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache: compiles dominate test time on this
# single-core box; cache them across runs.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
