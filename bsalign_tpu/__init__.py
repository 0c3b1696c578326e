"""bsalign-tpu: a TPU-native sequence-alignment framework.

A from-scratch reimplementation of the capabilities of ruanjue/bsalign
(banded striped 8-bit pairwise alignment, bit-parallel edit distance with
kmer-synteny guidance, and BSPOA multiple alignment / consensus / SNV
calling), redesigned batch-first for TPUs with jax/XLA/Pallas compute and
data-parallel scaling over device meshes.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Point JAX at a persistent on-disk compilation cache.

    Mosaic compiles of the banded-8 kernel take 2-4 minutes per new
    (T, W, mode) shape on hardware; with the cache, every repeat run of the
    CLI / bench / parity tools hits disk instead of recompiling.  Runs at
    import so every entry point (cli, bench, tools, tests) gets it; opt out
    with BSA_NO_COMPILE_CACHE=1.  Config flags only — no backend init here.
    """
    import os

    if os.environ.get("BSA_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "bsalign_tpu",
                         "jax_cache"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache everything, including sub-second XLA compiles: the parity
        # matrix / fuzzers build dozens of small programs per run
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass


_enable_compilation_cache()
