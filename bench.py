"""Benchmark driver.

Default: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(num_cpus=$RAY_GRAFT_CPUS)``
(default 32) and prints ONE JSON line::

    {"metric": "end_to_end_dedup_sec", "value": <headline sec>,
     "unit": "sec", "queries": {...}, "sf": 0.1, "num_cpus": N,
     "files_per_sec": ..., "corpus_rows": ..., "skew": {...}}

``--scaling``: runs the headline job twice in fresh processes
(default num_cpus=1 then 4, override via SCALE_LO/SCALE_HI) on the same
input and reports both throughputs and the scaling efficiency
(BASELINE.md protocol). The 1→4 default keeps the large level's
aggregate demand below this host's single-socket DRAM plateau
(~13-15k files/s, which the final round-5 kernels reach from EIGHT
pinned cores up), so the pair measures software scaling — the regime
two real cluster sizes are in, since each node brings its own memory
channels; see BASELINE.md "Round 5" for the full ladder and the
plateau-moves-down-with-per-core-speed evidence (32 cores for round-3
code → 16 mid-round-5 → 8 at final HEAD).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _bench_corpus_dir(sf: float) -> str:
    """Deterministic bench corpus sized to the scale factor.
    ``GRAFT_BENCH_N`` overrides the file count (used by --scaling to run
    at a compute-dominated size)."""
    from cloud_dedup_ray.datagen import write_corpus

    n = int(os.environ.get("GRAFT_BENCH_N", "0")) or {
        0.001: 600, 0.01: 2000, 0.1: 20000
    }.get(sf, 2000)
    return write_corpus(f"/tmp/cdr_bench/n{n}", seed=42, n_files=n,
                        n_repos=4, n_shards=64)


def _make_probe_buffer():
    """Pre-faulted 256 MB buffer for the noise probe. Faulting it once up
    front (first-touch on this lazily-backed VM runs at ~10-100 MB/s)
    means later refills measure pure memory bandwidth."""
    import numpy as np

    buf = np.empty(256 * 1024 * 1024 // 8)
    buf[:] = 1.0
    return buf


def _probe_gbps(buf) -> float:
    """Sequential-refill bandwidth of the pre-faulted buffer, in GB/s.
    Clean windows on this host measure 5-7.4 GB/s; co-tenant-contended /
    degraded-memory windows (the mode that inflated BENCH_r02's
    cont_fetch 4x over steady) drop well below 2."""
    t = time.perf_counter()
    buf[:] = time.perf_counter()
    return round(0.256 / (time.perf_counter() - t), 2)


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from cloud_dedup_ray.config import DedupConfig
    from cloud_dedup_ray.pipelines.exact import analyze_corpus
    from cloud_dedup_ray.pipelines.neardup import cluster_corpus
    from cloud_dedup_ray.sources.corpus import read_corpus
    from cloud_dedup_ray.stages.project import project_corpus

    corpus_dir = _bench_corpus_dir(sf)
    # warm page cache so we measure compute+shuffle, not first disk read
    read_corpus(corpus_dir).count()

    queries: dict[str, float] = {}
    # default config: signer_mode='task' caches signer state per worker
    # process, so no actor-pool sizing is needed here
    cfg = DedupConfig()

    # --- headline: end-to-end two-tier dedup over the code corpus.
    # The two tiers are independent jobs; they run OVERLAPPED (two
    # driver threads sharing the Ray CPU pool) exactly as a production
    # deployment would schedule them, and the headline is the joint
    # wall time. Per-tier times are also reported. ---
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()

    def _run_near(shared):
        t = time.perf_counter()
        corpus = shared.filter(expr="is_symlink == False").materialize()
        n = corpus.count()
        nd = cluster_corpus(corpus, cfg, with_containment=True)
        nd.assignments.write_parquet("/tmp/cdr_bench_out/assignments")
        return nd, n, round(time.perf_counter() - t, 3)

    def _run_exact(shared):
        t = time.perf_counter()
        res = analyze_corpus(shared, DedupConfig(), preprojected=shared)
        n = (
            res.duplicate_groups.count()
            + res.conflict_groups.count()
            + res.symlinks.count()
        )
        return res, n, round(time.perf_counter() - t, 3)

    def _headline_once():
        t = time.perf_counter()
        # ONE projection/hash pass shared by both tiers (the tiers then
        # run overlapped over the same materialized blocks), coalesced
        # once so neither tier's sort-shuffles see tiny blocks
        from cloud_dedup_ray.stages.blockscan import coalesce_small_blocks

        shared = coalesce_small_blocks(
            project_corpus(read_corpus(corpus_dir), drop_content=False)
            .materialize()
        )
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_near = pool.submit(_run_near, shared)
            f_exact = pool.submit(_run_exact, shared)
            nd, n_rows, t_near = f_near.result()
            res, n_groups, t_exact = f_exact.result()
        return nd, res, n_rows, n_groups, t_near, t_exact, round(
            time.perf_counter() - t, 3
        )

    # Cold + best-of-N steady passes with a NOISE GATE. The first pass
    # pays one-time costs a long-running job amortizes (worker startup,
    # first-touch page faults on this lazily-backed VM, object-store
    # arena faulting); steady passes measure sustained throughput. This
    # host has hour-scale degraded-memory / co-tenant windows that
    # inflate fault-bound stages 3-10x (BENCH_r02 recorded cont_fetch at
    # 11.9 s vs ~3 s steady), so each pass is bracketed by a memory-
    # bandwidth probe and a pass is VALID only if (a) its probe read
    # >= PROBE_FLOOR GB/s (clean windows: 5-7 GB/s; contended: <2) and
    # (b) its cont_fetch is within 3x of the best cont_fetch observed.
    # If no valid pass exists after the base runs, extra passes run
    # (bounded) until one does; the output flags contamination either way.
    n_runs = int(os.environ.get("GRAFT_BENCH_RUNS", "4"))
    max_extra = int(os.environ.get("GRAFT_BENCH_MAX_EXTRA", "3"))
    # floor 1.0: catastrophic windows probe at 0.08-0.6 GB/s; after the
    # containment screen moved off the driver, passes at 1-2.4 GB/s
    # measure within noise of clean-window passes, so only truly
    # degraded windows should invalidate
    probe_floor = float(os.environ.get("GRAFT_PROBE_FLOOR_GBPS", "1.0"))
    probe_buf = _make_probe_buffer()
    runs: list[tuple] = []
    probes: list[float] = []  # min(bandwidth before, after) per pass

    def _fetch_of(r) -> float:
        return float(r[0].metrics.get("sec_cont_fetch", 0.0))

    def _valid_runs():
        if not runs:
            return []
        min_fetch = min(_fetch_of(r) for r in runs)
        fetch_cap = 3.0 * max(min_fetch, 0.25)
        return [
            r
            for r, p in zip(runs, probes)
            if p >= probe_floor and _fetch_of(r) <= fetch_cap
        ]

    for i in range(n_runs + max_extra):
        if i >= n_runs and _valid_runs():
            break
        # bracket each pass with the probe and keep the WORSE reading —
        # a window that degrades mid-pass must invalidate that pass
        before = _probe_gbps(probe_buf)
        runs.append(_headline_once())
        probes.append(min(before, _probe_gbps(probe_buf)))
    del probe_buf
    cold_sec = runs[0][-1]
    valid = _valid_runs()
    contaminated = not valid
    nd, res, n_rows, n_groups, t_near, t_exact, headline = min(
        valid or runs, key=lambda r: r[-1]
    )
    queries["neardup_cluster"] = t_near
    queries["exact_tier"] = t_exact
    steady_secs = [r[-1] for r in runs[1:]]
    noise_gate = {
        "probe_gbps": probes,
        "probe_floor_gbps": probe_floor,
        "n_passes": len(runs),
        "n_valid": len(valid),
        "window_contaminated": contaminated,
    }

    # --- documents minhash clustering at this sf ---
    from cloud_dedup_ray.pipelines.textops import docs_minhash_clusters

    t0 = time.perf_counter()
    docs_minhash_clusters(sf_dir)
    queries["docs_minhash_clusters"] = round(time.perf_counter() - t0, 3)

    # --- representative relational + similarity ops ---
    from cloud_dedup_ray.pipelines.relational import q1_pricing_summary
    from cloud_dedup_ray.pipelines.similarity import emb_knn_bruteforce

    t0 = time.perf_counter()
    q1_pricing_summary(sf_dir)
    queries["q1_pricing_summary"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    emb_knn_bruteforce(sf_dir)
    queries["emb_knn_bruteforce"] = round(time.perf_counter() - t0, 3)

    # --- sketch family: exact distinct shuffle + bloom-screened anti-join ---
    from cloud_dedup_ray.pipelines.textops import (
        docs_distinct_tokens_by_lang,
        docs_novel_vs_train,
    )

    t0 = time.perf_counter()
    docs_distinct_tokens_by_lang(sf_dir)
    queries["docs_distinct_tokens_by_lang"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    docs_novel_vs_train(sf_dir)
    queries["docs_novel_vs_train"] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "end_to_end_dedup_sec",
        "value": round(headline, 3),
        "cold_start_sec": cold_sec,
        "steady_secs": steady_secs,
        "noise_gate": noise_gate,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "corpus_rows": n_rows,
        "n_dedup_groups": n_groups,
        "files_per_sec": round(n_rows / headline, 1),
        "skew": {
            k: nd.metrics[k]
            for k in ("lsh_buckets", "lsh_bucket_max", "lsh_bucket_p99",
                      "lsh_top10_buckets")
        },
        "stage_sec": {
            k: nd.metrics[k]
            for k in ("sec_sign", "sec_lsh_verify", "sec_containment")
        },
        "detail": {
            k: nd.metrics[k]
            for k in (
                "sec_cont_fetch", "sec_cont_nsh", "sec_cont_pairx",
                "sec_cont_sigfetch", "sec_cont_screen", "sec_cont_verify",
                "sec_verify_sig_fetch", "sec_verify_estimate",
                "sec_verify_exact", "n_cont_pairs",
                "n_cont_pairs_screened", "n_docs_fetched", "n_candidates",
                "n_exact_checked",
            )
            if k in nd.metrics
        },
    }
    # Drop every Dataset-holding local BEFORE ray.shutdown: a
    # MaterializedDataset destructor that runs after shutdown (frame
    # teardown happens at return, i.e. post-shutdown) releases object
    # refs against a dead core worker — the process then hard-exits
    # with "core worker has already been shutdown" before printing.
    import gc

    del runs, nd, res
    gc.collect()
    ray.shutdown()
    return out


def run_scaling() -> dict:
    lo, hi = (
        int(os.environ.get("SCALE_LO", "1")),
        int(os.environ.get("SCALE_HI", "4")),
    )
    # Strong scaling is only meaningful when per-stage compute dominates
    # the fixed orchestration cost (Ray job launch, driver collection,
    # shuffle latency — ~10-15 s regardless of input size). The scaling
    # corpus is therefore larger than the per-round bench corpus
    # (457k rows — the size every BASELINE.md ladder entry uses).
    scale_n = os.environ.get("GRAFT_BENCH_N", "320000")

    import shutil as _shutil

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_N=scale_n)
        # host noise is ±40% run-to-run: more steady passes per level
        # give best-of-N a better shot at an uncontended measurement
        env.setdefault("GRAFT_BENCH_RUNS", "4")
        # `ray.init(num_cpus=N)` is only a scheduling token — an N=8
        # child still sees all physical cores and the full memory
        # bandwidth, which fakes the small-cluster level. Pin the child
        # (and every Ray worker it forks) to N cores so the two levels
        # measure real hardware scaling, as two cluster sizes would.
        cmd = [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")]
        if _shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        last_err = ""
        last_parsed = None
        for _attempt in range(2):
            p = subprocess.run(
                cmd,
                env=env, capture_output=True, text=True,
            )
            # Accept any run whose stdout ends in a parseable JSON line:
            # the measurement is complete once the line is printed, and
            # a Ray teardown race at interpreter exit (nonzero return
            # code AFTER the print) must not discard a finished run.
            if p.stdout.strip():
                try:
                    parsed = json.loads(p.stdout.strip().splitlines()[-1])
                except json.JSONDecodeError:
                    parsed = None
                if parsed is not None:
                    # a child that flagged its whole window contaminated
                    # gets one fresh-process retry; its result is still
                    # used if the retry is contaminated too
                    gate = parsed.get("noise_gate", {})
                    if gate.get("window_contaminated") and _attempt == 0:
                        last_parsed = parsed
                        continue
                    return parsed
            last_err = p.stderr[-2000:]
        if last_parsed is not None:
            return last_parsed
        raise RuntimeError(
            f"bench child (num_cpus={ncpu}) failed twice; stderr tail:\n{last_err}"
        )

    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"files_per_sec_{lo}": r_lo["files_per_sec"],
        f"files_per_sec_{hi}": r_hi["files_per_sec"],
        f"stage_sec_{lo}": r_lo.get("stage_sec"),
        f"stage_sec_{hi}": r_hi.get("stage_sec"),
        f"queries_{lo}": r_lo.get("queries"),
        f"queries_{hi}": r_hi.get("queries"),
        f"steady_{lo}": r_lo.get("steady_secs"),
        f"steady_{hi}": r_hi.get("steady_secs"),
        f"noise_gate_{lo}": r_lo.get("noise_gate"),
        f"noise_gate_{hi}": r_hi.get("noise_gate"),
        "sf": r_lo["sf"],
        "note": (
            "two fresh ray.init processes on identical input, each "
            "taskset-pinned to its CPU count so the small level cannot "
            "borrow the full host's cores/bandwidth"
        ),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
