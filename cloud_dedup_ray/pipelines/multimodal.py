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


def _select_codec(module: str, attr: str | None, codec, allow_stub: bool,
                  what: str):
    """Shared once-per-actor codec selection: an injected ``codec`` wins
    (tests), else import ``module`` (and take ``attr`` off it) if the
    container ships it, else None — and with ``allow_stub=False`` a
    missing codec fails LOUDLY instead of silently faking features."""
    if codec is not None:
        return codec
    try:
        mod = __import__(module, fromlist=[attr] if attr else [])
        chosen = getattr(mod, attr) if attr else mod
    except ImportError:
        chosen = None
    if not allow_stub and chosen is None:
        raise NotImplementedError(
            f"real {what} requires {module}, not present in this "
            f"environment, and allow_stub=False forbids the stub path"
        )
    return chosen


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
        self.codec = _select_codec("PIL", "Image", codec, allow_stub,
                                   "image decoding")

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


def _parse_fimg(buf: bytes) -> np.ndarray:
    w, h, c = struct.unpack("<III", buf[4:16])
    return np.frombuffer(buf[16 : 16 + w * h * c], np.uint8).reshape(h, w, c)


def _pack_fimg(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return _MAGIC + struct.pack("<III", w, h, c) + arr.tobytes()


class ImageResizer:
    """Actor-pool resize stage → same (doc_id, image, format) layout with
    every payload resized to (``width`` × ``height``). Codec selection
    once per actor like :class:`ImageDecoder`: PIL's ``resize`` when
    importable, injected via ``codec`` in tests; FIMG payloads resize
    with a REAL vectorized nearest-neighbor gather (two ``np.take``
    index maps — the stub is the codec, not the kernel)."""

    def __init__(self, width: int = 32, height: int = 32,
                 allow_stub: bool = True, codec=None):
        self.width, self.height = int(width), int(height)
        self.codec = _select_codec("PIL", "Image", codec, allow_stub,
                                   "image resizing")

    def _resize_fimg(self, buf: bytes) -> bytes:
        arr = _parse_fimg(buf)
        h, w, _ = arr.shape
        rows = (np.arange(self.height) * h) // self.height
        cols = (np.arange(self.width) * w) // self.width
        out = np.take(np.take(arr, rows, axis=0), cols, axis=1)
        return _pack_fimg(np.ascontiguousarray(out))

    def _resize_codec(self, buf: bytes) -> bytes:
        import io

        img = self.codec.open(io.BytesIO(buf))
        arr = np.asarray(img.resize((self.width, self.height)))
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return _pack_fimg(np.ascontiguousarray(arr))

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for buf in t["image"].to_pylist():
            if buf[:4] == _MAGIC:
                out.append(self._resize_fimg(buf))
            elif self.codec is not None:
                out.append(self._resize_codec(buf))
            else:
                raise NotImplementedError(
                    "payload is not FIMG and no image codec is available"
                )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "image": pa.array(out, pa.binary()),
                "format": pa.array(["fimg"] * len(out), pa.string()),
            }
        )


def image_resize_features(
    sf_dir: str, width: int = 32, height: int = 32
) -> pd.DataFrame:
    """Resize → decode as two composed actor-pool stages (the resized
    payloads stream between pools through the object store; nothing is
    collected until the tiny feature table)."""
    imgs = build_image_table(sf_dir)
    out = (
        imgs.map_batches(
            ImageResizer,
            fn_constructor_kwargs={"width": width, "height": height},
            batch_format="pyarrow", batch_size=256,
            concurrency=(1, 4), num_cpus=1,
        )
        .map_batches(
            ImageDecoder,
            batch_format="pyarrow", batch_size=256,
            concurrency=(1, 4), num_cpus=1,
        )
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# audio: FAUD fake payloads, real vectorized feature kernel
# --------------------------------------------------------------------------

#: magic(4) | sample_rate(u32) | n_samples(u32) | int16 little-endian samples
_AMAGIC = b"FAUD"


def encode_fake_audio(seed_text: str) -> bytes:
    """Deterministic fake audio payload (int16 PCM-shaped) from a text
    seed — stands in for real audio bytes in tests/benchmarks."""
    h = hashlib.sha256(seed_text.encode()).digest()
    sample_rate = 8000 * (1 + h[0] % 2)            # 8 or 16 kHz
    n = 512 + int.from_bytes(h[1:3], "little") % 4096
    base = np.frombuffer((h * ((2 * n) // len(h) + 1))[: 2 * n], np.int16)
    return (
        _AMAGIC + struct.pack("<II", sample_rate, n) + base.tobytes()
    )


def build_audio_table(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, audio:binary, format:string) derived deterministically
    from the documents table."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def make(t: pa.Table) -> pa.Table:
        bufs = [encode_fake_audio(x) for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "audio": pa.array(bufs, pa.binary()),
                "format": pa.array(["faud"] * len(bufs), pa.string()),
            }
        )

    return ds.map_batches(make, batch_format="pyarrow")


class AudioFeatures:
    """Actor-pool audio feature stage → (doc_id, sample_rate,
    duration_sec, rms, zero_cross_rate, peak). Codec selected once per
    actor (``soundfile`` when importable, injectable for tests); FAUD
    payloads parse via the header and the feature kernel itself is real
    vectorized numpy over the int16 buffer."""

    def __init__(self, allow_stub: bool = True, codec=None):
        self.codec = _select_codec("soundfile", None, codec, allow_stub,
                                   "audio decoding")

    @staticmethod
    def _features(x: np.ndarray, sr: int) -> tuple:
        xf = x.astype(np.float64) / 32768.0
        rms = float(np.sqrt(np.mean(xf * xf))) if len(xf) else 0.0
        zc = (
            float(np.mean(np.signbit(xf[1:]) != np.signbit(xf[:-1])))
            if len(xf) > 1 else 0.0
        )
        peak = float(np.abs(xf).max()) if len(xf) else 0.0
        return (
            round(len(x) / sr, 4), round(rms, 4), round(zc, 4), round(peak, 4)
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        srs, durs, rmss, zcrs, peaks = [], [], [], [], []
        for buf in t["audio"].to_pylist():
            if buf[:4] == _AMAGIC:
                sr, n = struct.unpack("<II", buf[4:12])
                x = np.frombuffer(buf[12 : 12 + 2 * n], np.int16)
            elif self.codec is not None:
                import io

                data, sr = self.codec.read(io.BytesIO(buf), dtype="int16")
                data = np.asarray(data)
                # multichannel → mono mixdown: a flat reshape would
                # double duration per extra channel and compute the
                # zero-cross rate over interleaved L/R samples
                x = (
                    data.mean(axis=1).astype(np.int16)
                    if data.ndim > 1
                    else data
                )
            else:
                raise NotImplementedError(
                    "payload is not FAUD and no audio codec is available"
                )
            d, r, z, p = self._features(x, sr)
            srs.append(sr)
            durs.append(d)
            rmss.append(r)
            zcrs.append(z)
            peaks.append(p)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sample_rate": pa.array(srs, pa.int32()),
                "duration_sec": pa.array(durs, pa.float64()),
                "rms": pa.array(rmss, pa.float64()),
                "zero_cross_rate": pa.array(zcrs, pa.float64()),
                "peak": pa.array(peaks, pa.float64()),
            }
        )


def audio_features(sf_dir: str) -> pd.DataFrame:
    out = build_audio_table(sf_dir).map_batches(
        AudioFeatures,
        batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4), num_cpus=1,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# video: FVID fake payloads, frame sampling that composes with the
# image stages (sampled frames are emitted as FIMG payloads)
# --------------------------------------------------------------------------

#: magic(4) | width(u32) | height(u32) | n_frames(u32) | grayscale frames
_VMAGIC = b"FVID"


def encode_fake_video(seed_text: str) -> bytes:
    """Deterministic fake video payload (grayscale frame stack)."""
    h = hashlib.sha256(seed_text.encode()).digest()
    width = 8 + h[0] % 17
    height = 8 + h[1] % 17
    n_frames = 4 + h[2] % 13
    size = width * height * n_frames
    body = (h * (size // len(h) + 1))[:size]
    return _VMAGIC + struct.pack("<III", width, height, n_frames) + body


def build_video_table(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, video:binary, format:string) derived deterministically
    from the documents table."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def make(t: pa.Table) -> pa.Table:
        bufs = [encode_fake_video(x) for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "video": pa.array(bufs, pa.binary()),
                "format": pa.array(["fvid"] * len(bufs), pa.string()),
            }
        )

    return ds.map_batches(make, batch_format="pyarrow")


class VideoFrameSampler:
    """Actor-pool frame-sample stage: explode each video row into one
    row per sampled frame (every ``stride``-th frame, always including
    frame 0) — (doc_id, frame_idx, image:binary FIMG, format). The FIMG
    output composes directly with :class:`ImageDecoder` /
    :class:`ImageResizer` downstream. A real implementation swaps the
    FVID parser for a container demuxer (pyav/opencv) behind the same
    signature; neither is in this container, so non-FVID payloads fail
    loudly rather than fake it."""

    def __init__(self, stride: int = 2):
        if stride < 1:
            raise ValueError("stride must be >= 1")
        self.stride = int(stride)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for doc_id, buf in zip(t["doc_id"].to_pylist(), t["video"].to_pylist()):
            if buf[:4] != _VMAGIC:
                raise NotImplementedError(
                    "payload is not FVID and no video demuxer is available "
                    "(install pyav/opencv for real containers)"
                )
            w, h, n_frames = struct.unpack("<III", buf[4:16])
            frame_bytes = w * h
            body = np.frombuffer(
                buf[16 : 16 + frame_bytes * n_frames], np.uint8
            ).reshape(n_frames, h, w)
            for i in range(0, n_frames, self.stride):
                ids.append(doc_id)
                fidx.append(i)
                frames.append(_pack_fimg(body[i][:, :, None]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "image": pa.array(frames, pa.binary()),
                "format": pa.array(["fimg"] * len(frames), pa.string()),
            }
        )


class FrameDecoder(ImageDecoder):
    """Per-frame :class:`ImageDecoder` that carries ``frame_idx``
    through (codec still selected once per actor in ``__init__``)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        feat = super().__call__(t)
        return feat.add_column(1, "frame_idx", t["frame_idx"])


def video_frame_features(sf_dir: str, stride: int = 2) -> pd.DataFrame:
    """Frame-sample → per-frame decode as composed actor-pool stages;
    the per-frame feature table is the only collected output."""
    out = (
        build_video_table(sf_dir)
        .map_batches(
            VideoFrameSampler,
            fn_constructor_kwargs={"stride": stride},
            batch_format="pyarrow", batch_size=64,  # video payloads are big
            concurrency=(1, 4), num_cpus=1,
        )
        .map_batches(
            FrameDecoder,
            batch_format="pyarrow", batch_size=256,
            concurrency=(1, 4), num_cpus=1,
        )
        .to_pandas()
    )
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


# --- perceptual-hash (dHash) image dedup --------------------------------------

#: dHash grid: GH×(GW) cell means, bit k = cell[i,j] > cell[i,j+1]
_DHASH_GH, _DHASH_GW = 8, 9


def dhash64_gray(gray: np.ndarray) -> int:
    """64-bit difference hash (dHash; standard perceptual-hash family,
    cf. pHash/aHash) of a float grayscale matrix: area-mean downsample
    to an 8×9 grid (row/col buckets ``r*8//h`` / ``c*9//w`` — the same
    integer partition the pure-Python oracle loops over), then bit
    ``i*8+j = cell[i,j] > cell[i,j+1]`` packed MSB-first."""
    h, w = gray.shape
    rb = (np.arange(h) * _DHASH_GH) // h
    cb = (np.arange(w) * _DHASH_GW) // w
    flat_bucket = (rb[:, None] * _DHASH_GW + cb[None, :]).ravel()
    sums = np.bincount(flat_bucket, weights=gray.ravel(),
                       minlength=_DHASH_GH * _DHASH_GW)
    counts = np.bincount(flat_bucket, minlength=_DHASH_GH * _DHASH_GW)
    cells = (sums / counts).reshape(_DHASH_GH, _DHASH_GW)
    bits = cells[:, :-1] > cells[:, 1:]          # (8, 8)
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    return int((bits.ravel().astype(np.uint64) * weights).sum(dtype=np.uint64))


class ImagePHasher:
    """Actor-pool perceptual-hash stage → (doc_id, phash:int64). Codec
    selection once per actor like :class:`ImageDecoder`: PIL grayscale
    when importable (injected via ``codec`` in tests); FIMG payloads
    take the stub header + a REAL numpy dHash kernel (the stub is the
    codec, not the kernel). Non-FIMG without a codec fails loudly."""

    def __init__(self, allow_stub: bool = True, codec=None):
        self.codec = _select_codec("PIL", "Image", codec, allow_stub,
                                   "image hashing")

    def _gray_fimg(self, buf: bytes) -> np.ndarray:
        arr = _parse_fimg(buf)
        return arr.astype(np.float64).mean(axis=2)

    def _gray_codec(self, buf: bytes) -> np.ndarray:
        import io

        img = self.codec.open(io.BytesIO(buf))
        arr = np.asarray(img)
        if arr.ndim == 3:
            return arr.astype(np.float64).mean(axis=2)
        return arr.astype(np.float64)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = np.empty(t.num_rows, np.uint64)
        for i, buf in enumerate(t["image"].to_pylist()):
            if buf[:4] == _MAGIC:
                gray = self._gray_fimg(buf)
            elif self.codec is not None:
                gray = self._gray_codec(buf)
            else:
                raise NotImplementedError(
                    "payload is not FIMG and no image codec is available"
                )
            out[i] = dhash64_gray(gray)
        return pa.table(
            {"doc_id": t["doc_id"], "phash": pa.array(out.view(np.int64))}
        )


def image_phash_dedup(sf_dir: str, out_dir: str | None = None) -> pd.DataFrame:
    """Image-level dedup by perceptual hash: actor-pool dHash over the
    binary image column, then ONE groupby(phash) shuffle assigns each
    group its min-doc_id representative — (doc_id, phash, cluster_id),
    the multimodal twin of ``docs_exact_dedup``. Only (doc_id, phash)
    pairs move through the shuffle, never payload bytes. With
    ``out_dir`` the assignment table is ALSO written as partitioned
    parquet (the at-scale sink; the returned frame is the test-scale
    driver contract)."""
    phashed = build_image_table(sf_dir).map_batches(
        ImagePHasher,
        batch_format="pyarrow",
        batch_size=256,          # payload-heavy rows → small batches
        concurrency=(1, 4),
        num_cpus=1,
    )

    def _assign(g: pa.Table) -> pa.Table:
        rep = pa.compute.min(g["doc_id"])
        return g.append_column(
            "cluster_id", pa.array(np.full(g.num_rows, rep.as_py(), np.int64))
        )

    ds = phashed.groupby("phash").map_groups(_assign, batch_format="pyarrow")
    if out_dir is not None:
        ds = ds.materialize()
        ds.write_parquet(out_dir)
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out[["doc_id", "phash", "cluster_id"]]


# --- audio energy-delta fingerprint dedup -------------------------------------

#: audio fingerprint window (samples per energy cell). 37 is prime on
#: purpose: a window coprime to any power-of-two periodicity keeps the
#: fingerprint meaningful on periodic signals (a W that divides — or is
#: divided by — the signal period makes every window energy identical
#: and the fingerprint degenerates to all-zero bits; the deterministic
#: FAUD test payload repeats with period 16 samples and exposed exactly
#: that with W=64).
_AFP_WINDOW = 37


def afp64_samples(x: np.ndarray) -> int:
    """64-bit audio fingerprint (Shazam-style energy-delta signature,
    cf. Wang 2003 / Haitsma-Kalker 2002): integer energies of
    consecutive ``_AFP_WINDOW``-sample windows, bit ``b`` =
    energy[b+1] > energy[b] packed MSB-first (fewer than 65 windows →
    trailing bits 0). All
    arithmetic is EXACT int64, so the per-sample oracle agrees
    bit-for-bit."""
    w = _AFP_WINDOW
    n_win = len(x) // w
    if n_win < 2:
        return 0
    e = (x[: n_win * w].astype(np.int64) ** 2).reshape(n_win, w).sum(axis=1)
    k = min(64, n_win - 1)
    bits = e[1 : k + 1] > e[:k]
    weights = np.uint64(1) << np.arange(63, 63 - k, -1, dtype=np.uint64)
    return int((bits.astype(np.uint64) * weights).sum(dtype=np.uint64))


class AudioFingerprinter:
    """Actor-pool audio-fingerprint stage → (doc_id, afp:int64). Codec
    dispatch identical to :class:`AudioFeatures` (soundfile once per
    actor, FAUD header stub, loud failure otherwise); the fingerprint
    kernel is real integer numpy either way."""

    def __init__(self, allow_stub: bool = True, codec=None):
        self.codec = _select_codec("soundfile", None, codec, allow_stub,
                                   "audio fingerprinting")

    def __call__(self, t: pa.Table) -> pa.Table:
        out = np.empty(t.num_rows, np.uint64)
        for i, buf in enumerate(t["audio"].to_pylist()):
            if buf[:4] == _AMAGIC:
                _, n = struct.unpack("<II", buf[4:12])
                x = np.frombuffer(buf[12 : 12 + 2 * n], np.int16)
            elif self.codec is not None:
                import io

                data, _ = self.codec.read(io.BytesIO(buf), dtype="int16")
                data = np.asarray(data)
                x = data.mean(axis=1).astype(np.int16) if data.ndim > 1 else data
            else:
                raise NotImplementedError(
                    "payload is not FAUD and no audio codec is available"
                )
            out[i] = afp64_samples(x)
        return pa.table(
            {"doc_id": t["doc_id"], "afp": pa.array(out.view(np.int64))}
        )


def audio_fingerprint_dedup(
    sf_dir: str, out_dir: str | None = None
) -> pd.DataFrame:
    """Audio-level dedup by energy fingerprint — the audio twin of
    ``mm_image_phash_dedup``: actor-pool fingerprinting, then ONE
    groupby(afp) shuffle assigns min-doc_id representatives. Only
    (doc_id, afp) pairs cross the shuffle."""
    fps = build_audio_table(sf_dir).map_batches(
        AudioFingerprinter,
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4),
        num_cpus=1,
    )

    def _assign(g: pa.Table) -> pa.Table:
        rep = pa.compute.min(g["doc_id"])
        return g.append_column(
            "cluster_id", pa.array(np.full(g.num_rows, rep.as_py(), np.int64))
        )

    ds = fps.groupby("afp").map_groups(_assign, batch_format="pyarrow")
    if out_dir is not None:
        ds = ds.materialize()
        ds.write_parquet(out_dir)
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out[["doc_id", "afp", "cluster_id"]]


# --- video frame-aHash chain fingerprint dedup --------------------------------


def ahash64_gray_int(gray: np.ndarray) -> int:
    """64-bit average hash (aHash) of a uint8 grayscale frame: 8×8
    area-mean cells (integer partitions ``r*8//h`` / ``c*8//w`` — valid
    down to 8×8 frames, unlike dHash's 9-wide grid), bit = cell mean >
    GLOBAL pixel mean, decided by exact integer cross-multiplication
    ``cell_sum * n_pixels > total_sum * cell_count`` so the per-pixel
    oracle agrees bit-for-bit (no float mean ordering issues)."""
    h, w = gray.shape
    rb = (np.arange(h) * 8) // h
    cb = (np.arange(w) * 8) // w
    bucket = (rb[:, None] * 8 + cb[None, :]).ravel()
    # float64 sums of uint8 values are exact (integers < 2^53)
    s = np.bincount(bucket, weights=gray.ravel(), minlength=64).astype(np.int64)
    c = np.bincount(bucket, minlength=64).astype(np.int64)
    total = int(gray.sum(dtype=np.int64))
    n_px = h * w
    bits = s * n_px > total * c
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    return int((bits.astype(np.uint64) * weights).sum(dtype=np.uint64))


_SPLITMIX_C1, _SPLITMIX_C2, _SPLITMIX_C3 = (
    0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
)


def _splitmix64_int(x: int) -> int:
    """Scalar splitmix64 over Python ints (same constants as
    functions/hashing.splitmix64) — the video chain fold uses it so the
    pure-Python oracle can replicate the fold exactly."""
    m = (1 << 64) - 1
    x = (x + _SPLITMIX_C1) & m
    x = ((x ^ (x >> 30)) * _SPLITMIX_C2) & m
    x = ((x ^ (x >> 27)) * _SPLITMIX_C3) & m
    return x ^ (x >> 31)


class VideoFingerprinter:
    """Actor-pool video-fingerprint stage → (doc_id, vfp:int64): aHash
    every grayscale frame, then chain-fold the frame hashes in order
    (``fp = splitmix64(fp ^ ahash)``) — order-sensitive, so reordered
    or truncated frame stacks fingerprint differently. FVID payloads
    only (this container ships no video codec); non-FVID fails loudly
    like :class:`VideoFrameSampler`."""

    def __call__(self, t: pa.Table) -> pa.Table:
        out = np.empty(t.num_rows, np.uint64)
        for i, buf in enumerate(t["video"].to_pylist()):
            if buf[:4] != _VMAGIC:
                raise NotImplementedError(
                    "payload is not FVID and no video codec is available"
                )
            w, h, n_frames = struct.unpack("<III", buf[4:16])
            body = np.frombuffer(
                buf[16 : 16 + w * h * n_frames], np.uint8
            ).reshape(n_frames, h, w)
            fp = 0
            for f in range(n_frames):
                fp = _splitmix64_int(fp ^ ahash64_gray_int(body[f]))
            out[i] = fp
        return pa.table(
            {"doc_id": t["doc_id"], "vfp": pa.array(out.view(np.int64))}
        )


def video_fingerprint_dedup(
    sf_dir: str, out_dir: str | None = None
) -> pd.DataFrame:
    """Video-level dedup by the frame-aHash chain fingerprint — the
    video twin of ``mm_image_phash_dedup``; only (doc_id, vfp) pairs
    cross the one groupby shuffle, never frame bytes."""
    fps = build_video_table(sf_dir).map_batches(
        VideoFingerprinter,
        batch_format="pyarrow", batch_size=64,  # video payloads are big
        concurrency=(1, 4), num_cpus=1,
    )

    def _assign(g: pa.Table) -> pa.Table:
        rep = pa.compute.min(g["doc_id"])
        return g.append_column(
            "cluster_id", pa.array(np.full(g.num_rows, rep.as_py(), np.int64))
        )

    ds = fps.groupby("vfp").map_groups(_assign, batch_format="pyarrow")
    if out_dir is not None:
        ds = ds.materialize()
        ds.write_parquet(out_dir)
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out[["doc_id", "vfp", "cluster_id"]]
