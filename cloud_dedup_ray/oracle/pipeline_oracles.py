"""Independent pure-Python end-to-end oracles for the sketch-family
pipelines (CDC storage-dedup ratio, HyperLogLog vocabulary).

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

import math

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
