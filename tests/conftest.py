"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no automated tests for models/GP/hypergradients
(see SURVEY.md §4); we build the pyramid ourselves. Multi-chip sharding
is validated on a fake mesh per JAX best practice.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set before jax is imported anywhere. Note: the axon TPU plugin
# registers itself regardless of JAX_PLATFORMS, so we additionally pin the
# default device to CPU after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

# Persistent compilation cache: model-level tests compile sizable graphs;
# cache them across pytest runs. MUST be separate from the TPU runs'
# .jax_cache: the axon tunnel's remote compile server emits XLA:CPU AOT
# artifacts for ITS host's cpu features, and loading those here produces
# a cpu_aot_loader feature-mismatch warning and (observed) silently wrong
# numerics in cache-hit tests.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

