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
    # The equivalence of ``text.lower().split()`` to the pipeline's
    # collapse-whitespace → split(' ') → drop-empty holds only while
    # the corpus contains no whitespace other than plain spaces — pin
    # that precondition loudly instead of silently desynchronizing if
    # datagen ever introduces tabs/newlines/NBSP ([^\S ] = any
    # whitespace char that is not ' ').
    assert not df["text"].str.contains(r"[^\S ]", regex=True).any(), (
        "documents text contains non-space whitespace; "
        "oracle_hll_tokens_by_lang's tokenizer shortcut no longer "
        "matches the pipeline's normalize()+split(' ') contract"
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


def _sign_docs(
    docs: dict[int, str],
    shingle_k: int,
    num_perm: int,
    min_doc_chars: int,
    seed: int,
) -> tuple[dict[int, set[int]], dict[int, list[int]]]:
    """Per-doc normalize → shingle → OPH sign. ``docs`` maps doc_id to
    RAW text; returns (shingle sets, signatures)."""
    seed_tweak = int.from_bytes(
        hashlib.blake2b(str(seed).encode(), digest_size=8).digest(), "big"
    )
    sh: dict[int, set[int]] = {}
    sigs: dict[int, list[int]] = {}
    for doc_id, text in docs.items():
        norm = _norm(text)
        s = _shingles(norm, shingle_k) if len(norm) >= min_doc_chars else set()
        sh[doc_id] = s
        sigs[doc_id] = _oph_signature(s, num_perm, seed_tweak)
    return sh, sigs


def _exact_jaccard(x: set[int], y: set[int]) -> float:
    if not x and not y:
        return 1.0
    inter = len(x & y)
    return inter / (len(x) + len(y) - inter)


def _lsh_verified_edges(
    sh: dict[int, set[int]],
    sigs: dict[int, list[int]],
    threshold: float,
    num_bands: int,
    margin: float,
    cap: int,
) -> list[tuple[int, int]]:
    """LSH banding → capped candidate pairs → hybrid estimate/exact
    verification. Returns accepted edges (a < b)."""
    num_perm = len(next(iter(sigs.values()))) if sigs else 0
    band_tweaks = [(b * _TWEAK) % _MOD for b in range(num_bands)]
    buckets: dict[int, set[int]] = {}
    for doc_id, s in sh.items():
        if not s:
            continue  # explode_bands skips n_shingles == 0
        for b, bh in enumerate(_band_hashes(sigs[doc_id], num_bands)):
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
    return edges


def _min_label_components(edges) -> dict[int, int]:
    """node → min node id of its component, for nodes touched by edges."""
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
    return {x: find(x) for x in parent}


def _assignment_frame(ids, comp: dict[int, int]) -> pd.DataFrame:
    ids = sorted(ids)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "cluster_id": pd.Series(
                [comp.get(d, d) for d in ids], dtype="int64"
            ),
        }
    ).reset_index(drop=True)


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
    docs = {int(i): t for i, t in zip(df["doc_id"], df["text"])}
    sh, sigs = _sign_docs(docs, shingle_k, num_perm, min_doc_chars, seed)
    edges = _lsh_verified_edges(sh, sigs, threshold, num_bands, margin, cap)
    return _assignment_frame(docs.keys(), _min_label_components(edges))


def _containment_reference_edges(
    docs: dict[int, str],
    sh: dict[int, set[int]],
    sigs: dict[int, list[int]],
    precomp: dict[int, int],
    threshold: float,
    cap: int,
    anchors_k: int,
    sig_margin: float,
) -> list[tuple[int, int]]:
    """Reference of the suffix-array containment pass: bottom-k shingle
    anchor blocking → LSH-cluster representative collapse → shingle-
    count ratio prune → signature containment screen → exact substring
    verification (``small in big`` — equivalent to SuffixArray.contains,
    pinned by tests/test_neardup.py::test_suffix_array_matches_python_in)."""
    num_perm = len(next(iter(sigs.values()))) if sigs else 0
    # anchor groups: docs sharing a bottom-k shingle, 2..cap members
    by_anchor: dict[int, set[int]] = {}
    for d, s in sh.items():
        for a in sorted(s)[:anchors_k]:
            by_anchor.setdefault(a, set()).add(d)
    groups = {
        tuple(sorted(m)) for m in by_anchor.values() if 2 <= len(m) <= cap
    }
    # collapse to one representative (min member) per LSH cluster
    pruned: set[tuple[int, ...]] = set()
    for g in groups:
        reps: dict[int, int] = {}
        for m in g:  # ascending → first member per cluster is the min
            reps.setdefault(precomp.get(m, m), m)
        if len(reps) >= 2:
            pruned.add(tuple(sorted(reps.values())))

    # pair extraction: orient (big, small) by shingle count, drop pairs
    # the LSH tier owns (count ratio ≥ threshold ⇒ J ≥ threshold if
    # contained) and empty docs
    pairs: set[tuple[int, int]] = set()
    for g in pruned:
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                x, y = g[i], g[j]
                nx, ny = len(sh[x]), len(sh[y])
                if nx == 0 or ny == 0:
                    continue
                if min(nx, ny) >= threshold * max(nx, ny):
                    continue
                big, small = (x, y) if nx > ny else (y, x)
                pairs.add((big, small))

    norm_cache: dict[int, str] = {}

    def _n(d: int) -> str:
        if d not in norm_cache:
            norm_cache[d] = _norm(docs.get(d))
        return norm_cache[d]

    edges: set[tuple[int, int]] = set()
    for big, small in pairs:
        # signature containment screen: a contained pair's estimate
        # concentrates at r = |small|/|big|
        r = len(sh[small]) / len(sh[big])
        est = sum(u == v for u, v in zip(sigs[big], sigs[small])) / num_perm
        if est < r - sig_margin:
            continue
        bt, st = _n(big), _n(small)
        if not bt or not st or len(st) >= len(bt):
            continue
        if st in bt:
            edges.add((min(big, small), max(big, small)))
    return sorted(edges)


def oracle_nd_cluster_assignments(
    corpus_dir: str,
    shingle_k: int = 5,
    threshold: float = 0.7,
    num_perm: int = 128,
    num_bands: int = 32,
    margin: float = 0.11,
    cap: int = 64,
    min_doc_chars: int = 8,
    anchors_k: int = 8,
    sig_margin: float = 0.15,
    seed: int = 42,
) -> pd.DataFrame:
    """Reference answer for the ``nd_cluster_assignments`` driver query:
    the FULL near-dup tier (LSH + containment, DedupConfig defaults)
    over the deterministic synthetic corpus, per-document pure Python.
    Input prep mirrors the query's projection: drop hidden paths
    (``(^|/)\\.`` — covers .DS_Store) and symlinks; doc_id is the
    63-bit sha1 of (repo, path, commit) (functions/hashing.stable_id64)."""
    df = pd.read_parquet(
        corpus_dir, columns=["repo", "path", "commit", "content", "is_symlink"]
    )
    hidden = df["path"].str.contains(r"(?:^|/)\.", regex=True)
    df = df[~hidden & ~df["is_symlink"]]
    docs: dict[int, str] = {}
    for repo, path, commit, content in zip(
        df["repo"], df["path"], df["commit"], df["content"]
    ):
        key = f"{repo}\0{path}\0{commit or ''}"
        h = hashlib.sha1(key.encode()).digest()
        doc_id = int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF
        docs[doc_id] = content
    sh, sigs = _sign_docs(docs, shingle_k, num_perm, min_doc_chars, seed)
    lsh_edges = _lsh_verified_edges(sh, sigs, threshold, num_bands, margin, cap)
    precomp = _min_label_components(lsh_edges)
    cont_edges = _containment_reference_edges(
        docs, sh, sigs, precomp, threshold, cap, anchors_k, sig_margin
    )
    comp = _min_label_components(lsh_edges + cont_edges)
    return _assignment_frame(docs.keys(), comp)


def oracle_image_phash(sf_dir: str) -> pd.DataFrame:
    """Independent per-pixel reference for the image perceptual-hash
    stage (pipelines/multimodal.py ImagePHasher / dhash64_gray): the
    deterministic FIMG payload is regenerated from the documents text
    (the payload GENERATOR is the input-data definition, shared like
    the gear table), then grayscale, the 8×9 area-mean grid and the
    dHash bits are recomputed with explicit Python loops over pixels —
    no numpy kernels shared with the pipeline. Returns (doc_id, phash)
    as int64; the SQL twin derives cluster_id with a window function."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    gh, gw = 8, 9
    out = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        digest = hashlib.sha256(text.encode()).digest()
        w = 16 + digest[0] % 64
        h = 16 + digest[1] % 64
        c = 3
        body = (digest * ((w * h * c) // len(digest) + 1))[: w * h * c]
        # per-pixel grayscale + grid accumulation
        sums = [[0.0] * gw for _ in range(gh)]
        counts = [[0] * gw for _ in range(gh)]
        for r in range(h):
            i = (r * gh) // h
            for col in range(w):
                j = (col * gw) // w
                base = (r * w + col) * c
                gray = (body[base] + body[base + 1] + body[base + 2]) / 3.0
                sums[i][j] += gray
                counts[i][j] += 1
        cells = [
            [sums[i][j] / counts[i][j] for j in range(gw)] for i in range(gh)
        ]
        phash = 0
        for i in range(gh):
            for j in range(gw - 1):
                phash = (phash << 1) | (1 if cells[i][j] > cells[i][j + 1] else 0)
        # int64 view of the uint64 bit pattern (matches Arrow's storage)
        out.append((int(doc_id),
                    phash - (1 << 64) if phash >= (1 << 63) else phash))
    return pd.DataFrame(out, columns=["doc_id", "phash"])


def oracle_audio_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Independent per-sample reference for the audio energy-delta
    fingerprint (pipelines/multimodal.py afp64_samples): the FAUD
    payload's int16 stream is regenerated from the documents text, then
    window energies and delta bits are recomputed with explicit Python
    loops and arbitrary-precision ints. Returns (doc_id, afp) int64."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        digest = hashlib.sha256(text.encode()).digest()
        n = 512 + int.from_bytes(digest[1:3], "little") % 4096
        raw = (digest * ((2 * n) // len(digest) + 1))[: 2 * n]
        samples = []
        for i in range(n):
            v = raw[2 * i] | (raw[2 * i + 1] << 8)
            samples.append(v - 65536 if v >= 32768 else v)
        w = 37  # _AFP_WINDOW: coprime to the payload's 16-sample period
        n_win = n // w
        energies = []
        for b in range(n_win):
            e = 0
            for s in samples[b * w : (b + 1) * w]:
                e += s * s
            energies.append(e)
        fp = 0
        k = min(64, n_win - 1) if n_win >= 2 else 0
        for b in range(k):
            bit = 1 if energies[b + 1] > energies[b] else 0
            fp |= bit << (63 - b)
        out.append((int(doc_id), fp - (1 << 64) if fp >= (1 << 63) else fp))
    return pd.DataFrame(out, columns=["doc_id", "afp"])


def oracle_video_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Independent per-pixel reference for the video frame-aHash chain
    fingerprint (pipelines/multimodal.py VideoFingerprinter): FVID
    frames regenerated from the documents text; each frame's 8×8 aHash
    recomputed with explicit pixel loops and integer cross-multiplied
    comparisons; the chain fold replayed with Python-int splitmix64
    (shared constants, independent code). Returns (doc_id, vfp) int64."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    m = (1 << 64) - 1

    def splitmix(x: int) -> int:
        x = (x + 0x9E3779B97F4A7C15) & m
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & m
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & m
        return x ^ (x >> 31)

    out = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        digest = hashlib.sha256(text.encode()).digest()
        w = 8 + digest[0] % 17
        h = 8 + digest[1] % 17
        n_frames = 4 + digest[2] % 13
        body = (digest * ((w * h * n_frames) // len(digest) + 1))[
            : w * h * n_frames
        ]
        fp = 0
        for f in range(n_frames):
            frame = body[f * w * h : (f + 1) * w * h]
            sums = [[0] * 8 for _ in range(8)]
            counts = [[0] * 8 for _ in range(8)]
            total = 0
            for r in range(h):
                i = (r * 8) // h
                for col in range(w):
                    j = (col * 8) // w
                    px = frame[r * w + col]
                    sums[i][j] += px
                    counts[i][j] += 1
                    total += px
            ah = 0
            n_px = w * h
            for i in range(8):
                for j in range(8):
                    bit = 1 if sums[i][j] * n_px > total * counts[i][j] else 0
                    ah |= bit << (63 - (i * 8 + j))
            fp = splitmix(fp ^ ah)
        out.append((int(doc_id), fp - (1 << 64) if fp >= (1 << 63) else fp))
    return pd.DataFrame(out, columns=["doc_id", "vfp"])
