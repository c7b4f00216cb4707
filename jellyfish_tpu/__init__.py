"""jellyfish_tpu — a TPU-native k-mer counting framework.

A from-scratch rebuild of the capabilities of Jellyfish (gmarcais/Jellyfish,
reference mounted at /root/reference) designed for TPU hardware:

- 2-bit mer encoding / canonicalization as vectorized JAX array programs
  (vs. reference per-base scalar loop, include/jellyfish/mer_dna.hpp).
- GF(2) rectangular-binary-matrix hashing as an MXU bit-matmul
  (vs. reference per-mer XOR loop, include/jellyfish/rectangular_binary_matrix.hpp).
- The lock-free CAS hash table (include/jellyfish/large_hash_array.hpp) is
  replaced by a sort + segment-reduce LSM of hash-sorted runs resident in HBM —
  dump order (hash order) falls out of the data structure for free.
- Multi-chip scaling via jax.sharding Mesh + shard_map with all-to-all
  routing of mers to owner shards by hash prefix (replaces pthread
  shared-memory parallelism, which the reference uses exclusively).

File formats (JSON header, binary/sorted, text/sorted, bloomcounter) are
compatible with the reference so that databases interoperate.
"""

__version__ = "0.1.0"

import os as _os

# honor JAX_PLATFORMS even though the axon TPU plugin overrides the env
# var at backend init (must run before any backend is initialized)
_plat = _os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _plat.lower())
    except Exception:
        pass

from jellyfish_tpu.gf2 import GF2Matrix
from jellyfish_tpu.mer import MerDNA, string_canonicals, string_mers


def __getattr__(name):
    # lazily exported surfaces, keeping `import jellyfish_tpu` light:
    # SWIG-parity scripting classes (swig/*.i) and the batch/TPU API
    if name in ("HashCounter", "HashSet", "QueryMerFile", "ReadMerFile"):
        from jellyfish_tpu import api

        return getattr(api, name)
    if name == "MerCounter":
        from jellyfish_tpu.counter import MerCounter

        return MerCounter
    if name == "SequenceChunker":
        from jellyfish_tpu.io.parse import SequenceChunker

        return SequenceChunker
    if name == "ShardedMerCounter":
        from jellyfish_tpu.parallel import ShardedMerCounter

        return ShardedMerCounter
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
