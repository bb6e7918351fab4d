"""Pipeline configuration.

The reference's only configuration surface is its CLI
(/root/reference/src/cloud_duplicate_analyzer.py:1391-1426):
``--mtime-fuzz`` (default 5.0), ``--no-checksum``, ``--include-hidden``
plus output options. The rebuild pins those knobs in a dataclass and
adds the near-dup tier's sketch configuration, which must be identical
between runs for recall parity (BASELINE.json ``north_rule``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # ---- exact tier (reference parity knobs) ----
    #: seconds of mtime slack for "same version" (reference :1405-1406, :248)
    mtime_fuzz: float = 5.0
    #: hash content for verification; False → pairs classified "unverified"
    #: (reference --no-checksum, :254-255)
    use_checksum: bool = True
    #: drop dot-files / dot-dirs (reference :144-146); .DS_Store is
    #: always dropped regardless (:148-149)
    skip_hidden: bool = True
    #: parity=True replicates the reference's representative-path quirks
    #: (SURVEY.md §2.4 J2/J7); False picks corrected semantics.
    parity: bool = True

    # ---- near-dup tier (sketch config; MUST be stable across runs) ----
    #: token-shingle width
    shingle_k: int = 5
    #: number of MinHash permutations
    num_perm: int = 128
    #: 'oph' = one-permutation MinHash + rotation densification (O(n)
    #: per doc — the at-scale default); 'classic' = num_perm independent
    #: permutations (reference-style construction, ~num_perm× slower)
    minhash_scheme: str = "oph"
    #: LSH bands (num_perm % bands == 0); rows per band = num_perm // bands.
    #: 32 bands × 4 rows ⇒ per-pair banding collision ≥ 0.9998 at J = 0.7
    #: (1 − (1 − J^r)^b) — the hybrid exact-verify tier then makes the
    #: threshold decision exact.
    num_bands: int = 32
    #: signature-estimated Jaccard threshold for accepting a candidate pair
    jaccard_threshold: float = 0.7
    #: half-width of the estimator uncertainty band around the threshold:
    #: candidates with |estimate − threshold| < margin are re-verified
    #: with EXACT shingle Jaccard (≈3σ of the 128-entry estimator noise)
    verify_margin: float = 0.11
    #: RNG seed for the permutation parameters
    seed: int = 42
    #: LSH buckets larger than this emit a chain+star pair set instead of
    #: all O(b^2) pairs (skew guard for boilerplate buckets)
    bucket_pair_cap: int = 64
    #: bottom-k shingle anchors used to block the substring/containment pass
    containment_anchors: int = 8
    #: containment-pair signature screen: a contained pair's signature
    #: Jaccard concentrates at its shingle-count ratio r, so pairs with
    #: estimate < r − margin are dropped before text fetch / suffix-array
    #: build. ≈3.3σ of the 128-bin estimator noise; negative disables.
    containment_sig_margin: float = 0.15
    #: min normalized length for a doc to participate in the near-dup tier
    min_doc_chars: int = 8

    # ---- execution ----
    #: verified-edge count above which the FINAL component resolution
    #: runs as distributed min-label propagation
    #: (``state/union_find.py:label_propagation_components``) instead of
    #: the driver union-find; the driver UF still prunes the containment
    #: pass mid-pipeline (its edges are already collected for verify).
    distributed_components_threshold: int = 5_000_000
    #: candidate-pair-member count above which the signature-estimate
    #: step runs as a partitioned hash join of pairs × signatures
    #: (``neardup._estimate_pairs_distributed`` — three flat task waves,
    #: driver never holds signatures); below it the broadcast fetch +
    #: driver estimate is faster (one task wave). At 100-TB scale the
    #: distributed path is mandatory: the driver fetch is O(members ×
    #: num_perm × 8) bytes.
    distributed_estimate_threshold: int = 2_000_000
    #: rows per batch for the hashing / signing stages
    batch_size: int = 2048
    #: 'task' = task-pool signing with the signer cached per worker
    #: process (workers are REUSED across executions — no per-run actor
    #: startup/warmup; the state is deterministic from this config so it
    #: needs no actor identity); 'actor' = classic stateful actor pool
    #: sized by ``signer_concurrency``.
    signer_mode: str = "task"
    #: actor-pool size for the MinHash signer: (min, max)
    signer_concurrency: tuple[int, int] = (2, 8)
    #: checkpoint root (per-stage parquet + lineage manifests); None = off
    checkpoint_dir: str | None = None

    @property
    def rows_per_band(self) -> int:
        assert self.num_perm % self.num_bands == 0
        return self.num_perm // self.num_bands

    def fingerprint(self) -> str:
        """Stable hash of the semantically-relevant config, used in
        checkpoint lineage metadata so a resume never mixes configs."""
        import hashlib
        import json

        payload = {
            "mtime_fuzz": self.mtime_fuzz,
            "use_checksum": self.use_checksum,
            "skip_hidden": self.skip_hidden,
            "parity": self.parity,
            "shingle_k": self.shingle_k,
            "num_perm": self.num_perm,
            "minhash_scheme": self.minhash_scheme,
            "num_bands": self.num_bands,
            "jaccard_threshold": self.jaccard_threshold,
            "seed": self.seed,
            "bucket_pair_cap": self.bucket_pair_cap,
            "containment_anchors": self.containment_anchors,
            "containment_sig_margin": self.containment_sig_margin,
            "min_doc_chars": self.min_doc_chars,
        }
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True).encode()
        ).hexdigest()[:16]
