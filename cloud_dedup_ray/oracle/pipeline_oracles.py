"""Independent pure-Python end-to-end oracles for pipelines whose math
SQL cannot express (CDC storage-dedup ratio, HyperLogLog vocabulary,
MinHash-LSH near-dup clustering).

These recompute the pipeline answers with per-byte / per-token
reference implementations — a Python gear-hash loop, a reference cut
walker, a per-string polynomial hash, a per-hash register fold — that
share NO kernel code with the distributed pipelines (only the public
``_GEAR`` byte table and the hash CONSTANTS, i.e. the algorithm
definition, not its vectorized implementation). ``__ray_entry__``'s
queries() wrappers write each oracle's output to a parquet under
``/tmp/cdr_expected/`` before returning the Ray result, and the
matching ``oracle_sql()`` twin is ``SELECT * FROM read_parquet(...)``
— turning the driver's hash compare into a true Ray-vs-reference
check for pipelines whose math SQL cannot express.

The same reference logic is pinned at test scale by
``tests/test_cdc.py::test_docs_cdc_dedup_end_to_end_python_oracle``
and ``tests/test_sketch.py::test_hll_pipeline_end_to_end_python_oracle``;
``tests/test_pipeline_oracles.py`` asserts THIS module agrees with the
Ray pipelines on the real testdata tables.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd

_MOD = 1 << 64
_BASE = 0x9E3779B97F4A7C15


def _ref_hash_bytes(data: bytes) -> int:
    """Per-string reference of the segmented polynomial + length XOR +
    splitmix64 finalizer (matches functions/sketch.hash_strings_u64)."""
    h = 0
    for i, c in enumerate(data):
        h = (h + c * pow(_BASE, i, _MOD)) % _MOD
    h ^= len(data)
    x = (h + 0x9E3779B97F4A7C15) % _MOD
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) % _MOD
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) % _MOD
    return x ^ (x >> 31)


def _ref_cuts(lo: int, hi: int, candidates, min_size: int, max_size: int):
    """Reference cut-point walker: next candidate at offset >= min_size
    (cut AFTER the candidate byte), else force a cut at max_size / end."""
    cuts, pos = [], lo
    cand = [c for c in candidates if lo <= c < hi]
    while pos < hi:
        limit = min(pos + max_size, hi)
        nxt = next((c for c in cand if c >= pos + min_size and c < limit), None)
        cut = (nxt + 1) if nxt is not None else limit
        cuts.append((pos, cut))
        pos = cut
    return cuts


def oracle_cdc_dedup(
    sf_dir: str,
    min_size: int = 256,
    avg_bits: int = 10,
    max_size: int = 4096,
) -> pd.DataFrame:
    """Reference answer for ``textops.docs_cdc_dedup``: per-byte gear
    recurrence over the concatenated document bytes, reference cut
    walker per document, per-chunk polynomial hash, dict-based distinct
    fold. Running gear over the FULL concatenation (instead of the
    pipeline's per-batch buffers) is exact because the 64-byte gear
    window only disagrees within the first 63 bytes of a batch's first
    document, and min_size(=256) discards any candidate that close to
    a document start (same argument as the pytest oracle)."""
    from cloud_dedup_ray.functions.cdc import _GEAR

    texts = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )["text"].tolist()
    data = b"".join(t.encode() for t in texts)
    bounds = np.cumsum([0] + [len(t.encode()) for t in texts])

    mask = (1 << avg_bits) - 1
    h = 0
    cands = []
    for i, byte in enumerate(data):
        h = ((h << 1) + int(_GEAR[byte])) % _MOD
        if h & mask == 0:
            cands.append(i)

    seen: dict[int, list[int]] = {}
    for d in range(len(texts)):
        for s, e in _ref_cuts(
            int(bounds[d]), int(bounds[d + 1]), cands, min_size, max_size
        ):
            seen.setdefault(_ref_hash_bytes(data[s:e]), []).append(e - s)

    n_chunks = sum(len(v) for v in seen.values())
    uniq_bytes = sum(v[0] for v in seen.values())
    total_bytes = sum(sum(v) for v in seen.values())
    return pd.DataFrame(
        {
            "n_chunks": pd.Series([n_chunks], dtype="int64"),
            "n_unique_chunks": pd.Series([len(seen)], dtype="int64"),
            "total_bytes": pd.Series([total_bytes], dtype="int64"),
            "unique_bytes": pd.Series([uniq_bytes], dtype="int64"),
            "dedup_ratio": pd.Series(
                [round(uniq_bytes / total_bytes, 6) if total_bytes else 1.0],
                dtype="float64",
            ),
        }
    )


def oracle_hll_tokens_by_lang(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Reference answer for ``textops.docs_hll_tokens_by_lang``:
    per-token reference hash, per-hash register fold, float estimate
    with the linear-counting small-range correction (Flajolet et al.
    2007). Tokenization: ``text.lower().split()`` — equivalent to the
    pipeline's normalize→split-on-space→drop-empty on these tables
    (the documents text contains only plain spaces as whitespace)."""
    df = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    m = 1 << p
    regs: dict[str, list[int]] = {}
    for lang, text in zip(df["lang"], df["text"]):
        r = regs.setdefault(lang, [0] * m)
        for tok in text.lower().split():
            hh = _ref_hash_bytes(tok.encode())
            idx = hh >> (64 - p)
            suffix = hh & ((1 << (64 - p)) - 1)
            rho = (64 - p) - suffix.bit_length() + 1
            if rho > r[idx]:
                r[idx] = rho
    rows = []
    alpha = 0.7213 / (1.0 + 1.079 / m)
    for lang in sorted(regs):
        r = regs[lang]
        est = alpha * m * m / sum(2.0 ** -x for x in r)
        zeros = r.count(0)
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        rows.append({"lang": lang, "n_distinct_hll": int(round(est))})
    out = pd.DataFrame(rows, columns=["lang", "n_distinct_hll"])
    out["n_distinct_hll"] = out["n_distinct_hll"].astype("int64")
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup clustering reference (docs_minhash_clusters)
# ---------------------------------------------------------------------------
#
# A per-document pure-Python rerun of the whole near-dup tier at the
# docs_minhash_clusters parameterization (shingle_k=3, threshold=0.6,
# OPH num_perm=128, 32 bands, margin=0.11, cap=64, min_doc_chars=8,
# seed=42, containment off). It shares only the algorithm DEFINITION
# with the pipeline — the splitmix64 / golden-ratio constants, the OPH
# binning + optimal-densification probe sequence, the band/bucket key
# packing — re-expressed as scalar int loops; none of the vectorized
# kernels (numpy scatter-min, reduceat, lexsort bucketing, the Ray
# exchange) are imported. Any divergence in normalization, shingling,
# signatures, banding, the skew cap's chain+star edges, the hybrid
# estimate/exact verification, or the min-label components shows up as
# a different cluster assignment.

_SM_GOLD = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB
_TWEAK = 0xD6E8FEB86659FD93
_DENSIFY_STEP = 0xA24BAED4963EE407


def _sm64(x: int) -> int:
    x = (x + _SM_GOLD) % _MOD
    x = ((x ^ (x >> 30)) * _SM_M1) % _MOD
    x = ((x ^ (x >> 27)) * _SM_M2) % _MOD
    return x ^ (x >> 31)


def _norm(text: str | None) -> str:
    if text is None:
        return ""
    return re.sub(r"\s+", " ", text.lower(), flags=re.ASCII).strip()


def _shingles(norm: str, k: int) -> set[int]:
    toks = norm.split(" ")
    if not toks or toks == [""]:
        return set()
    h = [
        int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        for t in toks
    ]
    k = min(k, len(h))
    out = set()
    for i in range(len(h) - k + 1):
        acc = 0
        for j in range(k):
            acc = (acc + h[i + j] * pow(_BASE, k - 1 - j, _MOD)) % _MOD
        out.add(acc)
    return out


def _oph_signature(shingles: set[int], num_perm: int, seed_tweak: int) -> list[int]:
    empty_val = (1 << 63) - 1
    if not shingles:
        return [empty_val] * num_perm
    bin_bits = num_perm.bit_length() - 1
    val_bits = 64 - bin_bits
    sig: list[int | None] = [None] * num_perm
    for s in shingles:
        m = _sm64(s ^ seed_tweak)
        b = m >> val_bits
        v = m & ((1 << val_bits) - 1)
        if sig[b] is None or v < sig[b]:
            sig[b] = v
    filled = [x is not None for x in sig]
    for j in range(num_perm):
        if sig[j] is None:
            attempt = 1
            while True:
                tweak = (attempt * _DENSIFY_STEP) % _MOD
                src = _sm64(((j * _TWEAK + tweak) % _MOD) ^ seed_tweak) % num_perm
                if filled[src]:
                    sig[j] = sig[src]
                    break
                attempt += 1
    return sig  # type: ignore[return-value]


def _band_hashes(sig: list[int], num_bands: int) -> list[int]:
    r = len(sig) // num_bands
    out = []
    for b in range(num_bands):
        folded = 0
        for pos in range(r):
            folded ^= _sm64(sig[b * r + pos] ^ ((pos * _TWEAK) % _MOD))
        out.append(_sm64(folded))
    return out


def oracle_minhash_clusters(
    sf_dir: str,
    shingle_k: int = 3,
    threshold: float = 0.6,
    num_perm: int = 128,
    num_bands: int = 32,
    margin: float = 0.11,
    cap: int = 64,
    min_doc_chars: int = 8,
    seed: int = 42,
) -> pd.DataFrame:
    df = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    seed_tweak = int.from_bytes(
        hashlib.blake2b(str(seed).encode(), digest_size=8).digest(), "big"
    )
    ids = [int(i) for i in df["doc_id"]]
    sh: dict[int, set[int]] = {}
    sigs: dict[int, list[int]] = {}
    buckets: dict[int, set[int]] = {}
    band_tweaks = [(b * _TWEAK) % _MOD for b in range(num_bands)]
    for doc_id, text in zip(ids, df["text"]):
        norm = _norm(text)
        s = _shingles(norm, shingle_k) if len(norm) >= min_doc_chars else set()
        sh[doc_id] = s
        sig = _oph_signature(s, num_perm, seed_tweak)
        sigs[doc_id] = sig
        if not s:
            continue  # explode_bands skips n_shingles == 0
        for b, bh in enumerate(_band_hashes(sig, num_bands)):
            buckets.setdefault(_sm64(bh ^ band_tweaks[b]), set()).add(doc_id)

    pairs: set[tuple[int, int]] = set()
    for members_set in buckets.values():
        members = sorted(members_set)
        b = len(members)
        if b < 2:
            continue
        if b <= cap:
            for i in range(b):
                for j in range(i + 1, b):
                    pairs.add((members[i], members[j]))
        else:  # chain + star over sorted ids (skew cap)
            rep = members[0]
            for x, y in zip(members[:-1], members[1:]):
                pairs.add((x, y))
            for y in members[1:]:
                if rep != y:
                    pairs.add((rep, y))

    def _exact_jaccard(x: set[int], y: set[int]) -> float:
        if not x and not y:
            return 1.0
        inter = len(x & y)
        return inter / (len(x) + len(y) - inter)

    edges = []
    for a, b in pairs:
        sa, sb = sigs[a], sigs[b]
        est = sum(u == v for u, v in zip(sa, sb)) / num_perm
        if est >= threshold + margin:
            edges.append((a, b))
        elif est >= threshold - margin and (
            sh[a] and sh[b] and _exact_jaccard(sh[a], sh[b]) >= threshold
        ):
            edges.append((a, b))

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    cluster = {d: find(d) if d in parent else d for d in ids}
    out = pd.DataFrame(
        {
            "doc_id": pd.Series(sorted(ids), dtype="int64"),
            "cluster_id": pd.Series(
                [cluster[d] for d in sorted(ids)], dtype="int64"
            ),
        }
    )
    return out.reset_index(drop=True)
