"""cloud_dedup_ray — a Ray-Data-native data-processing / dedup engine.

A from-scratch rebuild of the capabilities of ``ndany/cloud-dedup``
(reference: /root/reference/src/cloud_duplicate_analyzer.py) expressed
as idiomatic ``ray.data.Dataset`` pipelines:

* **Exact tier** (reference parity): blocking on ``(name, size)`` →
  content-hash verification → duplicate / conflict / symlink groups,
  folder analytics, unique counts — the full ``analyze()`` surface of
  the reference, re-expressed as ``map_batches`` / ``groupby`` /
  ``map_groups`` over zero-copy Arrow blocks.
* **Near-dup tier** (north star): normalize → k-shingles → 128-perm
  MinHash (actor pool) → LSH bands (salted groupby) → candidate pairs →
  union-find → cluster ids, plus a suffix-array substring pass for
  exact containment that MinHash misses.
* **Training-data ops**: exact/MinHash/SimHash/n-gram/embedding dedup,
  ANN similarity search, language-ID, quality scoring, token counting,
  document fingerprinting, multimodal (binary-column) plumbing.

Library code never calls ``ray.init`` / ``ray.shutdown`` — the driver
owns the Ray session (see ``__ray_entry__.py``).
"""

from cloud_dedup_ray.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
