"""sotohp_ray — a Ray-Data-native inverted-index build + BM25 query engine.

Built from scratch against the behavior of the reference system
(dacr/sotohp, studied at /root/reference — see SURVEY.md): deterministic
document identity, code-aware tokenization, SPIMI-style partial posting
construction inside ``map_batches`` actor pools over zero-copy Arrow,
``groupby(term_shard)`` merge into docID-sorted delta+varint/bit-packed
posting lists with block-max metadata, top-k BM25 (k1=1.2, b=0.75) via
exact scoring and block-max WAND, per-partition lineage + resume.

Nothing in here calls ``ray.init()`` — sessions are owned by bench.py,
CLI entry points and the test fixture only.
"""

from sotohp_ray.config import BM25Params, IndexConfig, TokenizerRules

__all__ = ["BM25Params", "IndexConfig", "TokenizerRules"]
__version__ = "0.1.0"
