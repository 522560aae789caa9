"""Global configuration constants (reference: nnunet/configuration.py:3-4)."""
import os

default_num_threads = int(os.environ.get("MTTPU_def_n_proc", os.environ.get("nnUNet_def_n_proc", 8)))

# If the spacing ratio between the out-of-plane axis and the in-plane axes exceeds this,
# resampling is done separately along that axis (nearest/linear) to avoid interpolation
# artifacts in highly anisotropic CT (reference: configuration.py:4).
RESAMPLING_SEPARATE_Z_ANISO_THRESHOLD = 3


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable jax's persistent compilation cache. Essential on remote-compile
    TPU relays where even trivial programs have been observed to take minutes
    to compile: a warm cache turns re-runs of the same programs (bench,
    repeated CLI inference) into millisecond loads. Safe no-op if the jax
    version lacks the options."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "mttpu_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
