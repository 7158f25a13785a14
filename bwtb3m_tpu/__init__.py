"""bwtb3m_tpu — a TPU-native BWT / FM-index construction framework.

A from-scratch rebuild of the capabilities of gt1/bwtb3m (Burrows-Wheeler
Transform By Balanced Block Merging, reference drivers at /root/reference/src)
designed for JAX / XLA / Pallas on TPU rather than ported from the reference's
C++/libmaus2/OpenMP architecture.

Reference semantics implemented (see /root/reference/README.md "Output"):
the BWT is defined on the *circular* text (no terminator is appended; suffix
comparison wraps around), run-length encoded on disk, accompanied by a symbol
histogram, rank/position samples (preisa) and sampled suffix / inverse suffix
arrays.

Layer map (TPU-first redesign of SURVEY.md section 1):

  io/       on-disk formats + input types (compact k-bit, pac/pacterm, RL-BWT,
            .hist/.preisa/.sa/.isa, FASTA) -- host side, numpy/C++ codecs
  ops/      device kernels: prefix-doubling suffix sort, occ/rank tables,
            batched LF / backward-search, gap arrays  (jax / pallas)
  engine/   orchestration: BwtOptions -> compute_bwt() -> BwtResult,
            sampled SA/ISA derivation, verification (checkbwt equivalent)
  index/    FM index structures: DNARank occ tables, wavelet trees, sampled
            SA/ISA containers, BWA export
  lcp/      succinct PLCP construction (lcpbit equivalent) + RMQ
  apps/     applications: Hamming all-mapper, k-mer probe scan, LF speed bench
  parallel/ device mesh + multi-chip sharded sorting (shard_map sample sort)
  cli/      one command per reference driver program (29 tools)
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the doubling/sort graphs are expensive to
# compile (minutes through a remote-compile tunnel) but compile once per
# shape; cache them across processes.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.expanduser("~/.cache/bwtb3m_tpu_xla"),
)
# CPU compiles are seconds (and CPU AOT cached on one machine can
# SIGILL on another — the relay compile host differs); only cache the
# expensive TPU compilations.
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def _enable_jax_cache() -> None:
    """Apply cache config even when jax was imported before this package."""
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_jax_cache()
