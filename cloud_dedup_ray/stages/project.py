"""Projection / normalization / filter stage (M1–M6 in SURVEY.md §2.2).

One zero-copy Arrow ``map_batches`` pass that:
  * filters hidden entries (any path segment starting with '.') when
    ``skip_hidden`` (reference :144-146) and ``.DS_Store`` always
    (:148-149),
  * derives ``name`` (lowercased basename, :177), ``name_orig``,
    ``folder`` (dirname with ``(root)`` sentinel, :182), and
    ``path_lower`` (the mixed-type join key, :298-301).

Stateless → plain function tasks, no actor pool needed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from cloud_dedup_ray.functions import pathutils
from cloud_dedup_ray.functions.hashing import md5_hex, sha256_hex, stable_id64


def project_corpus(
    ds: ray.data.Dataset,
    skip_hidden: bool = True,
    use_checksum: bool = True,
    drop_content: bool = True,
) -> ray.data.Dataset:
    """Filter + derive columns + hash content once per row (M8).

    ``drop_content=True`` removes the wide ``content`` column right
    after hashing so downstream shuffles move only metadata + digests
    (SURVEY.md §7.5 "wide records").
    """

    def _project(batch: pa.Table) -> pa.Table:
        paths = batch["path"]
        keep = pc.invert(pathutils.ds_store_mask(paths))
        if skip_hidden:
            keep = pc.and_(keep, pc.invert(pathutils.hidden_mask(paths)))
        batch = batch.filter(keep)
        paths = batch["path"]
        name_orig = pathutils.basename(paths)
        batch = batch.append_column("name_orig", name_orig)
        batch = batch.append_column("name", pc.utf8_lower(name_orig))
        batch = batch.append_column("folder", pathutils.dirname(paths))
        batch = batch.append_column("path_lower", pc.utf8_lower(paths))
        batch = batch.append_column(
            "doc_id",
            stable_id64(
                batch["repo"], paths,
                batch["commit"] if "commit" in batch.schema.names else None,
            ),
        )
        if use_checksum:
            regular = pc.invert(batch["is_symlink"])
            content = pc.if_else(regular, batch["content"], pa.scalar(None, pa.string()))
            batch = batch.append_column("content_sha256", sha256_hex(content))
            batch = batch.append_column("content_md5", md5_hex(content))
        else:
            n = batch.num_rows
            batch = batch.append_column(
                "content_sha256", pa.array([None] * n, pa.string())
            )
            batch = batch.append_column(
                "content_md5", pa.array([None] * n, pa.string())
            )
        if drop_content:
            batch = batch.drop_columns(["content"])
        return batch

    return ds.map_batches(_project, batch_format="pyarrow", zero_copy_batch=True)
