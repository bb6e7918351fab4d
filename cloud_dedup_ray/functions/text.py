"""Text analysis kernels: normalization, shingling, token counting,
language-ID heuristic, quality scoring, rolling-hash fingerprints.

All functions are batch-level (Arrow array in → Arrow array out) so they
slot into ``map_batches(batch_format="pyarrow")`` with no per-row Python
dispatch in the Dataset layer. Semantics chosen to be expressible in
ANSI SQL where possible so the DuckDB oracle can verify them.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")


def normalize(texts: pa.Array) -> pa.Array:
    """lower → collapse whitespace runs to single spaces → trim.
    SQL twin: ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``."""
    lowered = pc.utf8_lower(texts)
    collapsed = pc.replace_substring_regex(lowered, r"\s+", " ")
    return pc.utf8_trim_whitespace(collapsed)


def token_count(texts: pa.Array) -> pa.Array:
    """Whitespace token count, 0 for blank strings.
    SQL twin: ``len(regexp_split_to_array(trim(text), '\\s+'))`` guarded
    for the empty string."""
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), r"\s+")
    n = pc.list_value_length(toks)
    # splitting "" yields [""] → count 1; force 0 for blank input
    blank = pc.equal(pc.utf8_trim_whitespace(texts), "")
    return pc.if_else(blank, pa.scalar(0, pa.int64()), pc.cast(n, pa.int64()))


# GPT-2-style pre-tokenizer (ASCII classes): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs. Whitespace
# itself is not a token. Counted with Arrow's RE2 engine — the SAME
# engine DuckDB's regexp_extract_all twin uses, so the pipeline and the
# oracle agree by construction (a prior Python `re.ASCII` counter
# silently diverged on \x0b: ASCII \s includes \v, RE2's \s does not).
_BPE_PRETOKEN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_count_bpe(texts: pa.Array) -> pa.Array:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    regex (the standard proxy for LLM token budgets when the real BPE
    merges aren't needed), one vectorized RE2 pass over the batch.
    SQL twin: ``len(regexp_extract_all(text, <same pattern>))``."""
    n = pc.count_substring_regex(texts, _BPE_PRETOKEN)
    return pc.cast(pc.fill_null(n, 0), pa.int64())


def char_ngrams(text: str, n: int) -> set[str]:
    if len(text) < n:
        return {text} if text else set()
    return {text[i : i + n] for i in range(len(text) - n + 1)}


def char_ngrams_hashed(text: str, n: int) -> np.ndarray:
    """Distinct character n-grams hashed to uint64 (sorted unique array):
    a rolling polynomial over the codepoints, splitmix-finalized. Same
    gram semantics as :func:`char_ngrams` (a text shorter than ``n`` is
    one gram of itself), so Jaccard over these arrays equals Jaccard over
    the string sets up to negligible 64-bit collisions — which lets the
    distributed pair pipeline verify candidates without materializing
    gram strings."""
    if not text:
        return np.empty(0, np.uint64)
    cps = np.frombuffer(text.encode("utf-32-le"), np.uint32).astype(np.uint64)
    k = min(n, len(cps))
    n_win = len(cps) - k + 1
    acc = np.zeros(n_win, np.uint64)
    p = 1
    for j in range(k - 1, -1, -1):
        acc += cps[j : j + n_win] * np.uint64(p)
        p = (p * int(_SHINGLE_BASE)) & 0xFFFFFFFFFFFFFFFF
    # splitmix64 finalizer: decorrelate the structured polynomial values
    # before they feed MinHash permutations / LSH band keys
    acc ^= acc >> np.uint64(30)
    acc *= np.uint64(0xBF58476D1CE4E5B9)
    acc ^= acc >> np.uint64(27)
    acc *= np.uint64(0x94D049BB133111EB)
    acc ^= acc >> np.uint64(31)
    return np.unique(acc)


_SHINGLE_BASE = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _blake2b64(t: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
    )


class TokenHashCache:
    """Memoized 64-bit token hashes. Source-code/text vocabularies repeat
    heavily, so caching turns per-shingle string hashing into dict hits;
    the k-shingle hash is then a vectorized rolling polynomial over the
    token-hash array (position-sensitive, mod 2^64). ``hash_fn`` picks
    the token hash (blake2b default; SimHash passes its md5-based
    ``token_hash64`` — same memo/bounding behavior, one implementation)."""

    __slots__ = ("cache", "max_entries", "hash_fn")

    def __init__(self, max_entries: int = 1 << 20, hash_fn=_blake2b64) -> None:
        # Bounded so a cache living in a long-lived (reused) Ray task
        # worker can't grow with the corpus vocabulary forever; a full
        # reset is cheap and correctness-neutral (pure memoization).
        self.cache: dict[str, int] = {}
        self.max_entries = max_entries
        self.hash_fn = hash_fn

    def hash_tokens(self, toks: list[str]) -> np.ndarray:
        c = self.cache
        if len(c) > self.max_entries:
            c.clear()
        fn = self.hash_fn
        out = np.empty(len(toks), np.uint64)
        for i, t in enumerate(toks):
            h = c.get(t)
            if h is None:
                h = fn(t)
                c[t] = h
            out[i] = h
        return out


def token_shingles_hashed(
    text: str, k: int, cache: TokenHashCache | None = None
) -> np.ndarray:
    """Distinct k-token shingles of a (pre-normalized) text, hashed to
    uint64 via a rolling polynomial over cached 64-bit token hashes.
    Returns a sorted unique array; empty docs → empty array."""
    toks = text.split(" ")
    if not toks or toks == [""]:
        return np.empty(0, np.uint64)
    cache = cache or TokenHashCache()
    h = cache.hash_tokens(toks)
    n = len(h)
    if n < k:
        k = n
    n_win = n - k + 1
    # shingle hash = Σ_j h[i+j] · BASE^(k-1-j)  (mod 2^64), vectorized
    acc = np.zeros(n_win, np.uint64)
    p = 1
    for j in range(k - 1, -1, -1):
        acc += h[j : j + n_win] * np.uint64(p)
        p = (p * int(_SHINGLE_BASE)) & 0xFFFFFFFFFFFFFFFF
    return np.unique(acc)


def _shingle_pows(k: int) -> np.ndarray:
    """pows[j] = BASE^(k-1-j) mod 2^64 — the same power ladder the
    per-doc rolling polynomial builds."""
    pows = np.empty(k, np.uint64)
    pows[-1] = 1
    with np.errstate(over="ignore"):
        for j in range(k - 2, -1, -1):
            pows[j] = pows[j + 1] * _SHINGLE_BASE
    return pows


def token_shingles_hashed_batch(
    texts: pa.Array,
    k: int,
    cache: TokenHashCache,
    min_doc_chars: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch twin of the signer's per-document shingling over a column
    of RAW texts: for each row, bit-identical to
    ``token_shingles_hashed(normalize(t), k)`` when
    ``len(normalize(t)) >= min_doc_chars`` and an empty set otherwise
    (null/blank rows included) — equivalence-tested in
    tests/test_functions.py. Returns ``(flat, lens)``: the doc-major
    concatenation of every document's sorted-unique shingle-hash array
    plus per-document lengths.

    Vectorized ACROSS the batch, and fuses normalization into the
    tokenizer: normalize's collapse-and-trim pass exists only so a
    single-space split yields clean tokens, so splitting the LOWERED
    text on ``\\s+`` directly produces the same token stream (empty
    pieces dropped) and the normalized length falls out as
    ``sum(len(tok)) + n_tok - 1`` — one RE2 pass instead of two. Each
    DISTINCT token is hashed once (``dictionary_encode`` + the shared
    memo cache) instead of one dict probe per token occurrence; the
    k-window rolling polynomial runs as k strided adds over the flat
    token-hash buffer (docs shorter than k tokens use their own
    k' = n_tok ladder, grouped by k'); per-doc unique is an in-place
    sort per document segment (many small cache-resident sorts beat
    one global lexsort ~3×) + one vectorized adjacent-dedup sweep."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    lens_out = np.zeros(n, np.int64)
    if n == 0:
        return np.empty(0, np.uint64), lens_out
    toks = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
    flat_tok = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    tok_len = pc.utf8_length(flat_tok).to_numpy(zero_copy_only=False)
    keep_tok = tok_len > 0
    n_tok_all = np.bincount(parent[keep_tok], minlength=n)
    norm_len = np.bincount(
        parent[keep_tok], weights=tok_len[keep_tok], minlength=n
    ).astype(np.int64) + np.maximum(n_tok_all - 1, 0)
    active = (n_tok_all > 0) & (norm_len >= min_doc_chars)
    if not active.any():
        return np.empty(0, np.uint64), lens_out
    keep_tok &= active[parent]
    flat_tok = flat_tok.filter(pa.array(keep_tok))
    act = np.flatnonzero(active)
    n_tok = n_tok_all[act]
    m = act.size
    # one hash per DISTINCT token, memoized across batches
    enc = flat_tok.dictionary_encode()
    vocab = enc.dictionary.to_pylist()
    c = cache.cache
    if len(c) > cache.max_entries:
        c.clear()
    fn = cache.hash_fn
    uh = np.empty(len(vocab), np.uint64)
    for i, t in enumerate(vocab):
        h = c.get(t)
        if h is None:
            h = fn(t)
            c[t] = h
        uh[i] = h
    th = uh[enc.indices.to_numpy()]
    starts = np.zeros(m, np.int64)
    np.cumsum(n_tok[:-1], out=starts[1:])
    # full-k windows in one global pass (boundary-straddling positions
    # are computed but never read — each doc reads only its own range)
    nw_global = th.size - k + 1
    if nw_global > 0:
        pows = _shingle_pows(k)
        acc = np.zeros(nw_global, np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                acc += th[j : j + nw_global] * pows[j]
    else:  # every active doc is shorter than k tokens
        acc = np.empty(0, np.uint64)
    n_win = np.where(n_tok >= k, n_tok - k + 1, 1)  # short docs: one window
    off = np.zeros(m, np.int64)
    np.cumsum(n_win[:-1], out=off[1:])
    total = int(off[-1] + n_win[-1])
    doc_of = np.repeat(np.arange(m), n_win)
    vals = np.empty(total, np.uint64)
    big = n_tok >= k
    big_rows = big[doc_of]
    vals[big_rows] = acc[
        (starts[doc_of] + (np.arange(total) - off[doc_of]))[big_rows]
    ]
    # short docs (0 < n_tok < k): one window with its own power ladder,
    # grouped by token count so each group is a single vectorized gather
    with np.errstate(over="ignore"):
        for v in np.unique(n_tok[~big]):
            rows = np.flatnonzero(n_tok == v)
            mat = th[starts[rows][:, None] + np.arange(v)]
            vals[off[rows]] = (mat * _shingle_pows(int(v))[None, :]).sum(
                axis=1, dtype=np.uint64
            )
    # per-doc sorted unique: small in-place segment sorts + one dedup sweep
    for d in range(m):
        vals[off[d] : off[d] + n_win[d]].sort()
    keep = np.empty(total, bool)
    keep[0] = True
    keep[1:] = (doc_of[1:] != doc_of[:-1]) | (vals[1:] != vals[:-1])
    lens_out[act] = np.bincount(doc_of[keep], minlength=m)
    return vals[keep], lens_out


# --- language ID (character n-gram heuristic, no external models) -----------

# tiny per-language profiles: the most characteristic trigrams/stopwords of
# each language, hand-assembled from public frequency lists.
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {" the", " and", " of ", " to ", "ing ", " is ", " that", " in "},
    "es": {" el ", " de ", " la ", " que", " los", " una", "ción", " por"},
    "fr": {" le ", " de ", " la ", " les", " des", " une", " est", " que"},
    "de": {" der", " die", " und", " das", " ein", "sch", " ist", " mit"},
    "zh": set(),  # CJK detected by codepoint range below
    "ja": set(),
}


def lang_id_one(text: str) -> str:
    """Heuristic language guess. CJK by codepoint; otherwise the profile
    with the most n-gram hits; 'und' when nothing matches."""
    if not text:
        return "und"
    sample = " " + text[:2000].lower() + " "
    cjk = sum(1 for ch in sample[:400] if "一" <= ch <= "鿿")
    kana = sum(1 for ch in sample[:400] if "぀" <= ch <= "ヿ")
    if kana > 2:
        return "ja"
    if cjk > 2:
        return "zh"
    best, best_hits = "und", 0
    for lang, grams in _LANG_PROFILES.items():
        if not grams:
            continue
        hits = sum(sample.count(g) for g in grams)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def lang_id(texts: pa.Array) -> pa.Array:
    """Per-document :func:`lang_id_one` over a batch. Deliberately NOT
    rewritten onto Arrow kernels: the hot part is 32 substring counts
    per document, and CPython's ``str.count`` (two-way memmem, ~GB/s)
    beats ``pc.count_substring`` (~0.36 GB/s measured) by ~2× on this
    shape, so the loop over documents IS the fast path here."""
    return pa.array([lang_id_one(t) if t is not None else "und"
                     for t in texts.to_pylist()], pa.string())


# --- quality scoring ---------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on "
    "with as by at from".split()
)


def quality_features(texts: pa.Array) -> dict[str, pa.Array]:
    """Cheap quality features: char length, token count, mean token
    length, alpha ratio, stopword ratio. The first three have exact SQL
    twins; ratios are verified rows-only."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
    n_tokens = token_count(texts)
    # ONE tokenization for every token-derived feature, and the SAME
    # RE2 \s+ split the n_tokens column and the DuckDB twin use —
    # mixing Python str.split() (Unicode \s) in here would make
    # mean/stop ratios inconsistent with their own n_tokens denominator
    # on NBSP/\x0b-bearing text. All three ratios are batch-vectorized
    # (list_flatten + bincount over parent indices; per-codepoint
    # isalpha via a unique-codepoint lookup table) — bit-identical to
    # the per-document loop (equivalence test in tests/test_functions.py).
    mean_tok = np.zeros(n, np.float64)
    alpha_ratio = np.zeros(n, np.float64)
    stop_ratio = np.zeros(n, np.float64)
    if n:
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), r"\s+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = tok_len > 0  # split('') yields [''] — not a token
        cnt = np.bincount(parents[keep], minlength=n).astype(np.float64)
        sum_len = np.bincount(
            parents[keep], weights=tok_len[keep], minlength=n
        )
        is_stop = pc.is_in(
            pc.utf8_lower(flat), value_set=pa.array(sorted(_STOPWORDS))
        ).to_numpy(zero_copy_only=False)
        stop_cnt = np.bincount(parents[keep & is_stop], minlength=n)
        has = cnt > 0
        mean_tok[has] = sum_len[has] / cnt[has]
        stop_ratio[has] = stop_cnt[has] / cnt[has]
        # alpha ratio: Python str.isalpha per codepoint, evaluated once
        # per DISTINCT codepoint in the batch, then gathered
        filled = pc.fill_null(texts, "")
        joined = "".join(filled.to_pylist())
        if joined:
            cps = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
            lens = pc.utf8_length(filled).to_numpy(zero_copy_only=False)
            ends = np.cumsum(lens)
            uniq, inv = np.unique(cps, return_inverse=True)
            amap = np.fromiter(
                (chr(int(c)).isalpha() for c in uniq), bool, len(uniq)
            )
            cum = np.concatenate(([0], np.cumsum(amap[inv])))
            n_alpha = cum[ends] - cum[ends - lens]
            pos = lens > 0
            alpha_ratio[pos] = n_alpha[pos] / lens[pos]
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": pa.array(mean_tok),
        "alpha_ratio": pa.array(alpha_ratio),
        "stopword_ratio": pa.array(stop_ratio),
    }


def quality_score(feats: dict[str, pa.Array]) -> pa.Array:
    """Scalar quality score in [0,1]: penalize too-short docs, garbage
    (low alpha ratio) and stopword-free keyword soup."""
    n_tokens = np.asarray(feats["n_tokens"], np.float64)
    alpha = np.asarray(feats["alpha_ratio"], np.float64)
    stop = np.asarray(feats["stopword_ratio"], np.float64)
    length_term = np.clip(n_tokens / 50.0, 0.0, 1.0)
    stop_term = np.clip(stop / 0.2, 0.0, 1.0)
    score = 0.4 * length_term + 0.4 * alpha + 0.2 * stop_term
    # round HALF-AWAY to 6 decimals (floor(x*1e6+0.5): scores are ≥0)
    # to match the DuckDB twin's round(): the score is built from small
    # rationals, so EXACT half-microunit ties occur (e.g. 0.7730625 at
    # sf0.1 doc 4280) and np.round's half-even choice diverges there —
    # equivalence with DuckDB verified over 250k values incl. ties
    return pa.array(np.floor(score * 1e6 + 0.5) / 1e6)


# --- document fingerprinting (winnowing-style rolling hash) ------------------

def fingerprint64(texts: pa.Array, window: int = 16) -> pa.Array:
    """64-bit document fingerprint: XOR of the minima of rolling-hash
    windows over the normalized text (a winnowing-style selection, cf.
    Schleimer et al. 2003). Deterministic and order-stable.

    Vectorized ACROSS the batch: the window hashes for every document
    are computed in one pass of ``window`` strided adds over the flat
    UTF-8 buffer (window positions that straddle a document boundary
    are computed but never read — each doc only consumes its own
    ``len - window + 1`` valid positions), and the winnowing minima +
    per-doc XOR folds run as two ``reduceat`` sweeps. Only texts whose
    normalized form is 1..window bytes take the per-doc blake2b branch
    (cryptographic hash — not vectorizable, and those docs are cheap).
    Equivalence with the per-document reference implementation is
    property-tested (tests/test_textops.py)."""
    norm = normalize(texts)
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    n = len(norm)
    out = np.zeros(n, np.uint64)
    if n == 0:
        return pa.array(out.view(np.int64))
    norm = norm.cast(pa.large_string())
    bufs = norm.buffers()
    offsets = np.frombuffer(bufs[1], np.int64, n + 1, 8 * norm.offset)
    lo, hi = int(offsets[0]), int(offsets[-1])
    data = np.frombuffer(bufs[2], np.uint8, hi - lo, lo)
    starts = (offsets[:-1] - lo).astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)

    # short docs (1..window bytes): blake2b per doc, loop only over them
    short = np.flatnonzero((lens > 0) & (lens <= window))
    if short.size:
        db = data.tobytes()
        for i in short:
            seg = db[starts[i] : starts[i] + lens[i]]
            out[i] = np.uint64(
                int.from_bytes(hashlib.blake2b(seg, digest_size=8).digest(), "big")
            )

    longm = np.flatnonzero(lens > window)
    if longm.size == 0:
        return pa.array(out.view(np.int64))
    base = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        pows = np.empty(window, np.uint64)
        pows[-1] = 1
        for j in range(window - 2, -1, -1):
            pows[j] = pows[j + 1] * base
        # hash of the window starting at flat position i:
        # sum(data[i+j] * base**(w-1-j)) mod 2^64 — one global pass
        n_win_global = data.size - window + 1
        u = data.astype(np.uint64)
        hashes = np.zeros(n_win_global + 1, np.uint64)  # +1 sentinel slot
        for j in range(window):
            hashes[:n_win_global] += u[j : j + n_win_global] * pows[j]
    # winnow per doc: minima over chunks of `window` consecutive valid
    # window positions [s_d, s_d + n_win_d), then XOR the chunk minima.
    s = starts[longm]
    n_win = lens[longm] - window + 1
    n_chunks = (n_win + window - 1) // window
    cum = np.zeros(len(longm), np.int64)
    np.cumsum(n_chunks[:-1], out=cum[1:])
    tot = int(cum[-1] + n_chunks[-1])
    doc_of = np.repeat(np.arange(len(longm)), n_chunks)
    k = np.arange(tot) - cum[doc_of]
    chunk_lo = s[doc_of] + window * k
    chunk_hi = np.minimum(chunk_lo + window, (s + n_win)[doc_of])
    # interleaved (lo, hi) reduceat: even segments are the real chunks,
    # odd segments ([hi_i, lo_{i+1}) — boundary garbage) are discarded.
    # chunk_hi can equal n_win_global for the batch's last chunk, which
    # reduceat rejects as an index — hence the sentinel slot above.
    idx = np.empty(2 * tot, np.int64)
    idx[0::2] = chunk_lo
    idx[1::2] = chunk_hi
    chunk_min = np.minimum.reduceat(hashes, idx)[0::2]
    out[longm] = np.bitwise_xor.reduceat(chunk_min, cum)
    return pa.array(out.view(np.int64))
