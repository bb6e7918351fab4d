"""Deterministic synthetic source-code corpus generator.

Produces the BASELINE.json ``input_hint`` table::

    repo:string, path:string, commit:string, lang:string, content:string,
    size:int64, mtime:double, is_symlink:bool, symlink_target:string

Scenarios planted (FIXTURES.md §3): exact clones across repos,
near-duplicates (small edit mutations), boilerplate license skew (one
giant LSH bucket), substring containment, empty files, case-variant
names, cross-folder duplicates, symlinks (identical / diverged /
dangling targets), mixed file-vs-symlink paths, hidden files and
``.DS_Store`` noise, and random non-duplicate controls.

Symlink rows carry the reference's sentinels ``size=-1, mtime=0.0``
(/root/reference/src/cloud_duplicate_analyzer.py:161-162, observed
behavior only — no code copied).

Everything is a pure function of ``(seed, n_files)`` so tests, bench
runs and resume checks all see byte-identical input.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "js", "go", "java", "md", "txt"]

_WORDS = (
    "loader parser index batch stream buffer merge token cursor shard "
    "vector column schema record offset digest bucket window filter reduce "
    "client server config handler router worker queue cache metric trace"
).split()

LICENSE_TEXT = (
    "Permission is hereby granted, free of charge, to any person obtaining "
    "a copy of this software and associated documentation files, to deal "
    "in the software without restriction, including without limitation the "
    "rights to use, copy, modify, merge, publish, distribute, sublicense, "
    "and/or sell copies of the software, subject to the following "
    "conditions: the above copyright notice and this permission notice "
    "shall be included in all copies or substantial portions of the "
    "software. THE SOFTWARE IS PROVIDED AS IS, WITHOUT WARRANTY OF ANY "
    "KIND, EXPRESS OR IMPLIED."
)


def _synth_code(rng: random.Random, n_lines: int, lang: str) -> str:
    lines = []
    for _ in range(n_lines):
        w = [rng.choice(_WORDS) for _ in range(rng.randint(3, 9))]
        if lang == "py":
            lines.append(f"def {w[0]}_{w[1]}({', '.join(w[2:4])}):")
            lines.append(f"    return {w[-1]} + {rng.randint(0, 999)}")
        elif lang in ("js", "go", "java"):
            lines.append(f"function {w[0]}{w[1].title()}() {{ return '{w[-1]}'; }}")
        else:
            lines.append(" ".join(w))
    return "\n".join(lines) + "\n"


def _mutate(rng: random.Random, text: str, n_edits: int) -> str:
    """Apply ``n_edits`` small token-level edits (near-dup construction)."""
    toks = text.split(" ")
    for _ in range(n_edits):
        i = rng.randrange(len(toks))
        op = rng.random()
        if op < 0.4:
            toks[i] = rng.choice(_WORDS)
        elif op < 0.7:
            toks.insert(i, rng.choice(_WORDS))
        elif len(toks) > 4:
            toks.pop(i)
    return " ".join(toks)


def _commit(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(12))


def generate_corpus(
    seed: int = 42,
    n_files: int = 600,
    n_repos: int = 3,
    dup_frac: float = 0.15,
    near_frac: float = 0.15,
    license_frac: float = 0.08,
    with_symlinks: bool = True,
) -> pa.Table:
    """Build the corpus table in memory. ``n_files`` counts base files;
    planted duplicates add ~(dup+near+license) on top."""
    rng = random.Random(seed)
    repos = [f"repo{chr(ord('a') + i)}" for i in range(n_repos)]
    rows: list[dict] = []

    def add(repo, path, content, mtime, lang=None, is_symlink=False, target=None):
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": _commit(rng),
                "lang": lang or path.rsplit(".", 1)[-1],
                "content": content,
                "size": -1 if is_symlink else len(content.encode()),
                "mtime": 0.0 if is_symlink else float(mtime),
                "is_symlink": is_symlink,
                "symlink_target": target,
            }
        )

    # --- base corpus: unique files spread across repos/folders ---
    for i in range(n_files):
        repo = repos[i % n_repos]
        lang = rng.choice(LANGS)
        folder = rng.choice(
            ["src", "src/core", "lib", "lib/util", "docs", "tests", "pkg/api"]
        )
        content = _synth_code(rng, rng.randint(5, 60), lang)
        add(repo, f"{folder}/f{i:05d}.{lang}", content, 1000.0 + i)

    base = list(rows)

    # --- exact clones across repos (same path → exact-tier groups) ---
    n_dup = int(n_files * dup_frac)
    for i in range(n_dup):
        src = base[rng.randrange(len(base))]
        other = rng.choice([r for r in repos if r != src["repo"]])
        # half same-version (mtime within fuzz), half diverged
        mt = src["mtime"] + (rng.choice([1.0, 4.0]) if i % 2 else 3600.0 * (i + 1))
        add(other, src["path"], src["content"], mt, src["lang"])

    # --- conflicts: same path+size, different content ---
    for i in range(max(2, n_dup // 4)):
        src = base[rng.randrange(len(base))]
        other = rng.choice([r for r in repos if r != src["repo"]])
        body = src["content"]
        if len(body) > 4:
            flip = ("x" if body[0] != "x" else "y") + body[1:]
            mt = src["mtime"] if i % 2 else src["mtime"] + 7200.0
            add(other, src["path"], flip, mt, src["lang"])

    # --- near-dups: small edit mutations, different paths ---
    n_near = int(n_files * near_frac)
    for i in range(n_near):
        src = base[rng.randrange(len(base))]
        other = rng.choice([r for r in repos if r != src["repo"]])
        mutated = _mutate(rng, src["content"], max(1, len(src["content"]) // 400))
        add(other, f"vendor/{src['path']}", mutated, src["mtime"] + 50.0, src["lang"])

    # --- boilerplate skew: identical license text in many rows ---
    n_lic = int(n_files * license_frac)
    for i in range(n_lic):
        repo = repos[i % n_repos]
        add(repo, f"third_party/mod{i:04d}/LICENSE.txt", LICENSE_TEXT, 1234.0, "txt")

    # --- substring containment: file A embedded verbatim in larger B ---
    for i in range(max(2, n_files // 100)):
        src = base[rng.randrange(len(base))]
        pad_pre = _synth_code(rng, 40, src["lang"])
        pad_post = _synth_code(rng, 40, src["lang"])
        big = pad_pre + src["content"] + pad_post
        other = rng.choice([r for r in repos if r != src["repo"]])
        add(other, f"bundle/bundle{i:03d}.{src['lang']}", big, 5000.0 + i, src["lang"])

    # --- empty files (always (identical, same) regardless of mtime) ---
    add(repos[0], "misc/empty.txt", "", 1000.0, "txt")
    add(repos[1], "misc/empty.txt", "", 9000.0, "txt")

    # --- case-variant names (matched case-insensitively) ---
    cv = _synth_code(rng, 10, "txt")
    add(repos[0], "notes/README.TXT", cv, 1000.0, "txt")
    add(repos[1], "notes/readme.txt", cv, 1002.0, "txt")

    # --- cross-folder duplicate (same (name,size), different folders) ---
    xf = _synth_code(rng, 12, "md")
    add(repos[0], "x/report.md", xf, 1000.0, "md")
    add(repos[1], "y/report.md", xf, 1001.0, "md")

    # --- within-repo duplicate (hits[0] quirk exercise) ---
    wr = _synth_code(rng, 9, "txt")
    add(repos[0], "a1/dup2.txt", wr, 1000.0, "txt")
    add(repos[0], "z9/dup2.txt", wr, 1000.0, "txt")
    add(repos[1], "q/dup2.txt", wr, 1003.0, "txt")

    if with_symlinks:
        # identical targets
        add(repos[0], "links/cur.txt", "", 0, "txt", True, "/data/v1.txt")
        add(repos[1], "links/cur.txt", "", 0, "txt", True, "/data/v1.txt")
        # diverged targets
        add(repos[0], "links/latest.txt", "", 0, "txt", True, "/data/v1.txt")
        add(repos[1], "links/latest.txt", "", 0, "txt", True, "/data/v2.txt")
        # dangling both sides
        add(repos[0], "links/gone.txt", "", 0, "txt", True, None)
        add(repos[1], "links/gone.txt", "", 0, "txt", True, None)
        # mixed type: regular in repo a, symlink in repo b (same rel path)
        mx = _synth_code(rng, 6, "txt")
        add(repos[0], "mixed/item.txt", mx, 1000.0, "txt")
        add(repos[1], "mixed/item.txt", "", 0, "txt", True, "/data/item.txt")

    # --- hidden files + .DS_Store noise ---
    add(repos[0], ".hidden.txt", "secret", 1000.0, "txt")
    add(repos[1], ".hidden.txt", "secret", 1001.0, "txt")
    add(repos[0], ".git/config", "cfg", 1000.0, "txt")
    add(repos[0], "src/.DS_Store", "junk", 1000.0, "txt")
    add(repos[1], "src/.DS_Store", "junk", 1000.0, "txt")

    cols = {
        k: [r[k] for r in rows]
        for k in (
            "repo path commit lang content size mtime is_symlink symlink_target"
        ).split()
    }
    return pa.table(
        {
            "repo": pa.array(cols["repo"], pa.string()),
            "path": pa.array(cols["path"], pa.string()),
            "commit": pa.array(cols["commit"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "content": pa.array(cols["content"], pa.string()),
            "size": pa.array(cols["size"], pa.int64()),
            "mtime": pa.array(cols["mtime"], pa.float64()),
            "is_symlink": pa.array(cols["is_symlink"], pa.bool_()),
            "symlink_target": pa.array(cols["symlink_target"], pa.string()),
        }
    )


def write_corpus(
    out_dir: str,
    seed: int = 42,
    n_files: int = 600,
    n_repos: int = 3,
    n_shards: int = 8,
    **kw,
) -> str:
    """Write the corpus as ``n_shards`` parquet files (so reads
    parallelize) and return ``out_dir``. Idempotent: a marker file keyed
    by the generation parameters short-circuits regeneration."""
    import json
    import os

    params = {"seed": seed, "n_files": n_files, "n_repos": n_repos,
              "n_shards": n_shards, **kw}
    key = hashlib.sha256(json.dumps(params, sort_keys=True).encode()).hexdigest()[:16]
    marker = os.path.join(out_dir, f"_complete_{key}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for stale in os.listdir(out_dir):
        os.unlink(os.path.join(out_dir, stale))
    table = generate_corpus(seed=seed, n_files=n_files, n_repos=n_repos, **kw)
    # deterministic shard assignment by row hash of (repo,path)
    keys = [
        int.from_bytes(
            hashlib.sha1(f"{r}\0{p}".encode()).digest()[:4], "big"
        ) % n_shards
        for r, p in zip(table["repo"].to_pylist(), table["path"].to_pylist())
    ]
    arr = np.asarray(keys)
    for s in range(n_shards):
        shard = table.take(pa.array(np.nonzero(arr == s)[0]))
        pq.write_table(shard, os.path.join(out_dir, f"part-{s:05d}.parquet"))
    with open(marker, "w") as f:
        f.write(json.dumps(params, sort_keys=True))
    return out_dir
