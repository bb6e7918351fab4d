"""Per-stage Parquet checkpoints with lineage metadata (north rule:
"every stage checkpoints per-partition signature and bucket state to
Parquet with lineage metadata so a killed run resumes without
recomputing completed partitions").

Layout::

    <root>/<stage>/data/part-*.parquet      (the stage output)
    <root>/<stage>/_lineage.json            (fingerprint + row count)

A stage is "complete" iff ``_lineage.json`` exists AND its fingerprint
(config hash + stage name) matches AND its per-stage ``scope`` matches.
The scope carries the exact input slice the stage was built from (e.g.
the partition's sorted file list + the partition count), so re-running
after corpus files were added/removed or ``num_partitions`` changed
invalidates every shifted partition instead of silently reusing stale
signatures for the wrong file subset. Writes are atomic: data lands in
``data.tmp`` and is renamed before the lineage marker is written, so a
kill mid-write never yields a half-checkpoint that passes validation.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data


class StageCheckpoint:
    def __init__(self, root: str, fingerprint: str):
        self.root = root
        self.fingerprint = fingerprint
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _lineage_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "_lineage.json")

    def complete(self, stage: str, scope: str = "") -> bool:
        path = self._lineage_path(stage)
        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return (
            meta.get("fingerprint") == self.fingerprint
            and meta.get("scope", "") == scope
        )

    def load(self, stage: str) -> ray.data.Dataset:
        return ray.data.read_parquet(os.path.join(self._stage_dir(stage), "data"))

    def save(
        self, stage: str, ds: ray.data.Dataset, scope: str = ""
    ) -> ray.data.Dataset:
        """Write ``ds`` then the lineage marker; returns a re-read
        Dataset so downstream stages consume the checkpoint (and the
        original lineage can be released)."""
        sdir = self._stage_dir(stage)
        tmp = os.path.join(sdir, "data.tmp")
        final = os.path.join(sdir, "data")
        for d in (tmp, final):
            if os.path.exists(d):
                shutil.rmtree(d)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp)
        os.rename(tmp, final)
        n_files = len(os.listdir(final))
        with open(self._lineage_path(stage), "w") as f:
            json.dump(
                {
                    "fingerprint": self.fingerprint,
                    "stage": stage,
                    "scope": scope,
                    "n_files": n_files,
                    "written_at": time.time(),
                },
                f,
            )
        return self.load(stage)

    def run(
        self, stage: str, build, scope: str = ""
    ) -> tuple[ray.data.Dataset, bool]:
        """→ (dataset, was_resumed). ``build`` is a thunk producing the
        stage Dataset; skipped entirely when the checkpoint is valid."""
        if self.complete(stage, scope):
            return self.load(stage), True
        return self.save(stage, build(), scope), False
