"""datr_tpu: a TPU-native (JAX/XLA/Pallas) domain-adaptive detection-transformer framework.

From-scratch rebuild of the capabilities of DATR (h751410234/DATR, IEEE TIP 2025):
a DINO-style deformable detection transformer with unsupervised domain adaptation
(GRL image discriminator, prototype adversarial + contrastive alignment) and a
two-stage teacher-student self-training pipeline — redesigned for TPU:

- multi-scale deformable attention as a Pallas kernel (reference CUDA ext:
  models/dino/ops/src/cuda/ms_deform_attn_cuda.cu)
- static-shape everything (padded canvases, capped targets, static CDN layout)
- pure-functional model/criterion/train-step under jit
- mesh-sharded data/model parallelism via jax.sharding instead of DDP/NCCL
"""

__version__ = "0.1.0"

# --- persistent compilation cache workaround -------------------------------
# This image's jax 0.9 silently ignores the JAX_COMPILATION_CACHE_DIR /
# JAX_PERSISTENT_CACHE_* environment variables (the cache logs
# "disabled/not initialized" and never writes); only jax.config.update
# works. Honor the env vars here so every consumer — pytest (conftest sets
# them), subprocess CLI tests, tools/, the driver entry — gets the cache
# the envvars promise. XLA-CPU compiles of the scan-heavy training steps
# take minutes; this is the difference between cold and warm everywhere.
def _enable_compile_cache():
    import os

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not path:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", 2.0)),
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes",
            int(os.environ.get(
                "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", 0)),
        )
    except Exception:  # never let a cache knob break an import
        pass


_enable_compile_cache()
del _enable_compile_cache
