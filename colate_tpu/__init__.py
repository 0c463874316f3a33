"""colate_tpu — a TPU-native coalescence-rate engine.

A from-scratch reimplementation of the capabilities of leospeidel/Colate
(reference: /root/reference) designed for JAX/XLA/Pallas on TPU:

- host-side columnar preprocessing of site streams (numpy / C++),
- device-side binning of mutation-age evidence into block histograms,
- a fully vectorized EM over [bootstraps, age_bins, epochs] tensors,
- block-bootstrap as a batched matmul,
- multi-chip scaling via ``jax.sharding`` + ``shard_map`` + ``psum``.

The reference implementation is a single-core C++ CLI; nothing here is a
translation of it.  File-format compatibility (``.mut``, ``.colate.in``,
``.coal``, ``.colate_mat``) and numerical parity on its workloads are
preserved so existing Colate users can switch directly.
"""

__version__ = "0.1.0"

import os as _os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes (compiles of the f64
    EM program are expensive; steady-state iteration is microseconds)."""
    import jax

    cache_dir = path or _os.environ.get(
        "COLATE_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/colate_tpu_jax")
    )
    _os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def enable_x64() -> None:
    """Enable float64 in JAX (required for reference-parity numerics).

    TPU executes f64 via software emulation; the EM tensors are tiny
    ([bootstraps, 185, epochs]) so this costs little, while the
    throughput-critical binning pass runs in f32/f64 mixed precision.
    """
    import jax

    jax.config.update("jax_enable_x64", True)
