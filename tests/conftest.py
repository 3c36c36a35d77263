import os

# Run tests on a fake 8-device CPU mesh: the JAX-native way to exercise
# multi-chip sharding without hardware (SURVEY.md §4 implication (c)).
# NOTE: this image's sitecustomize registers a TPU plugin that overrides the
# JAX_PLATFORMS env var, so the platform must be forced via jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA-CPU compiles of scan-heavy programs are
# slow; cache them across test runs. The env vars alone are NOT enough on
# this image's jax 0.9 (it silently ignores them and the cache never
# initializes — discovered round 5 after four rounds of cold compiles);
# they are still exported for subprocess tests, whose datr_tpu import
# applies the same jax.config workaround (datr_tpu/__init__.py).
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache_dir))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
    config.addinivalue_line(
        "markers",
        "parity: builds the live torch reference (heavy fixtures) — "
        'run the pure-JAX units alone with -m "not parity and not slow"',
    )


import pytest  # noqa: E402

# Long in-process runs (the slow e2e suite) accumulate tens of thousands of
# memory mappings from LLVM-JIT'd XLA-CPU executables (~3.5k/compile-heavy
# test, measured via /proc/self/maps); at the kernel's default
# vm.max_map_count=65530 the NEXT mmap fails inside jaxlib's
# backend_compile_and_load and the process SEGFAULTS (observed twice, both
# ~30-70 min in, each victim test passing in isolation). Two defenses:
# raise the limit when we can (root containers), and drop JAX's in-memory
# executables before the ceiling otherwise — the persistent compilation
# cache makes the re-loads cheap.
try:  # privileged containers only; harmless no-op elsewhere
    with open("/proc/sys/vm/max_map_count") as _f:
        _limit = int(_f.read())
    if _limit < 262144:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("1048576")
        _limit = 1048576
except OSError:
    _limit = 65530


@pytest.fixture(autouse=True)
def _bound_jit_code_mappings():
    yield
    try:
        with open("/proc/self/maps", "rb") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > int(_limit * 0.7):
        jax.clear_caches()
