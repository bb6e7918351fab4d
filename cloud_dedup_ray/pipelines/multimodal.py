"""Multimodal (binary-column) plumbing.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages with SMALL
batch sizes (payload bytes dominate block size). The actual codec
libraries are not in this container, so the decode kernel is a
clearly-marked deterministic stub behind the same actor signature the
real implementation would use — the Ray-side plumbing (schema, batch
sizing, actor pool, output layout) is real and tested.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

#: deterministic fake header: magic(4) | width(u32) | height(u32) | channels(u32)
_MAGIC = b"FIMG"


def encode_fake_image(seed_text: str) -> bytes:
    """Deterministic fake image payload derived from a text seed —
    stands in for real image bytes in tests/benchmarks."""
    h = hashlib.sha256(seed_text.encode()).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    channels = 3
    body = (h * ((width * height * channels) // len(h) + 1))[: width * height * channels]
    return _MAGIC + struct.pack("<III", width, height, channels) + body


def build_image_table(sf_dir: str) -> ray.data.Dataset:
    """Derive a deterministic image table from the documents table:
    (doc_id, image:binary, format:string)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def make(t: pa.Table) -> pa.Table:
        imgs = [encode_fake_image(x) for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "image": pa.array(imgs, pa.binary()),
                "format": pa.array(["fimg"] * len(imgs), pa.string()),
            }
        )

    return ds.map_batches(make, batch_format="pyarrow")


class ImageDecoder:
    """Actor-pool decode stage. The codec is selected ONCE per actor in
    ``__init__`` (the stateful-stage contract): PIL when importable,
    else the deterministic FIMG stub. Real payloads route through the
    codec; FIMG payloads always parse via the stub header, so the same
    stage handles mixed corpora and test fixtures. With neither a codec
    nor a FIMG magic, the row fails loudly — no silent fake features.

    ``codec`` injects a PIL-compatible module in tests (this container
    ships no image library)."""

    def __init__(self, allow_stub: bool = True, codec=None):
        if codec is not None:
            self.codec = codec
        else:
            try:
                from PIL import Image  # guarded: not in this container

                self.codec = Image
            except ImportError:
                self.codec = None
        if not allow_stub and self.codec is None:
            raise NotImplementedError(
                "real image decoding requires PIL/opencv, not present in "
                "this environment, and allow_stub=False forbids the FIMG "
                "stub decoder"
            )

    def _decode_codec(self, buf: bytes) -> tuple[int, int, int, float]:
        import io

        img = self.codec.open(io.BytesIO(buf))
        arr = np.asarray(img)
        c = 1 if arr.ndim == 2 else int(arr.shape[2])
        return int(img.width), int(img.height), c, round(float(arr.mean()), 4)

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, channels, mean_px = [], [], [], []
        for buf in t["image"].to_pylist():
            if buf[:4] == _MAGIC:
                w, h, c = struct.unpack("<III", buf[4:16])
                body = np.frombuffer(buf[16:], np.uint8)
                m = round(float(body.mean()), 4)
            elif self.codec is not None:
                w, h, c, m = self._decode_codec(buf)
            else:
                raise NotImplementedError(
                    "payload is not FIMG and no image codec is available "
                    "(install PIL for real decoding)"
                )
            widths.append(w)
            heights.append(h)
            channels.append(c)
            mean_px.append(m)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "channels": pa.array(channels, pa.int32()),
                "mean_pixel": pa.array(mean_px, pa.float64()),
            }
        )


def image_features(sf_dir: str) -> pd.DataFrame:
    """Decode/feature-extract via an actor pool with payload-aware batch
    size (small batches: payload bytes dominate)."""
    imgs = build_image_table(sf_dir)
    out = imgs.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=256,          # payload-heavy rows → small batches
        concurrency=(1, 4),
        num_cpus=1,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
