import os
import sys

# 8 virtual CPU devices so sharding tests exercise a real multi-device mesh
# without TPU hardware.  Must be set before the first backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU.  The surrounding environment registers a TPU PJRT plugin at
# interpreter start and pins JAX_PLATFORMS=axon; the env var alone is not
# honored, so override through the config API — unit tests must not burn
# TPU time on tiny-shape compiles.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is dominated by CPU jit
# compiles of the same train/predict programs run-to-run; cache them under
# .pytest_jax_cache (gitignored) so warm runs skip recompilation.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".pytest_jax_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
