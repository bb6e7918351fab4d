"""Dup-pair recall harness (BASELINE.json correctness target).

Ground truth = brute-force exact Jaccard over the SAME shingle config
(the reference semantics of "a duplicate pair" at identical
shingle-size/num-perm/band configuration): every unordered doc pair
whose exact k-shingle Jaccard ≥ threshold is a true dup pair. Recall =
fraction of true pairs that land in the same near-dup cluster.

Brute force is O(n²) so this runs at test scale only; the planted
generator guarantees a dense-enough pair population for the ≥0.99 gate
to be meaningful.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

from cloud_dedup_ray.config import DedupConfig
from cloud_dedup_ray.functions.minhash import exact_jaccard
from cloud_dedup_ray.functions.text import token_shingles_hashed


def true_dup_pairs(
    docs: dict[int, str], cfg: DedupConfig
) -> set[tuple[int, int]]:
    """All unordered pairs with exact shingle-Jaccard ≥ cfg.jaccard_threshold.
    ``docs`` maps doc_id → NORMALIZED content."""
    shingles = {
        d: token_shingles_hashed(t, cfg.shingle_k)
        for d, t in docs.items()
        if t and len(t) >= cfg.min_doc_chars
    }
    # size blocking: |A∩B|/|A∪B| ≥ τ requires |A|/|B| ≥ τ — skip hopeless pairs
    tau = cfg.jaccard_threshold
    ids = sorted(shingles, key=lambda d: shingles[d].size)
    out = set()
    for i, a in enumerate(ids):
        sa = shingles[a]
        if sa.size == 0:
            continue
        for b in ids[i + 1 :]:
            sb = shingles[b]
            if sa.size < tau * sb.size:
                break  # sorted by size → all later b are even larger
            if exact_jaccard(sa, sb) >= tau:
                out.add((min(a, b), max(a, b)))
    return out


def pair_recall(
    assignments: dict[int, int], truth: set[tuple[int, int]]
) -> tuple[float, int, int]:
    """→ (recall, n_found, n_truth)."""
    if not truth:
        return 1.0, 0, 0
    found = sum(
        1
        for a, b in truth
        if assignments.get(a) is not None and assignments.get(a) == assignments.get(b)
    )
    return found / len(truth), found, len(truth)
