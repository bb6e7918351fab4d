"""Multimodal binary-column plumbing: FIMG stub decode end-to-end,
codec-path dispatch (injected PIL-compatible codec — the real library is
absent in this container), and the no-silent-fallback guarantees."""

import io
import struct

import numpy as np
import pyarrow as pa
import pytest

from cloud_dedup_ray.pipelines.multimodal import (
    _MAGIC,
    ImageDecoder,
    encode_fake_image,
    image_features,
)


def test_image_features_end_to_end():
    out = image_features("/root/testdata/sf0.001")
    assert list(out.columns) == [
        "doc_id", "width", "height", "channels", "mean_pixel",
    ]
    assert len(out) > 0
    assert (out["channels"] == 3).all()
    assert out["width"].between(16, 80).all()
    # deterministic: same payload → same features
    out2 = image_features("/root/testdata/sf0.001")
    assert out.equals(out2)


def test_stub_decode_matches_header():
    buf = encode_fake_image("hello")
    w, h, c = struct.unpack("<III", buf[4:16])
    dec = ImageDecoder()
    t = dec(pa.table({"doc_id": pa.array([1], pa.int64()),
                      "image": pa.array([buf], pa.binary())}))
    assert t["width"][0].as_py() == w
    assert t["height"][0].as_py() == h
    assert t["channels"][0].as_py() == c


class _FakePILImage:
    """PIL-compatible test double: open() parses a trivial raw format
    ``RAW!|w(u32)|h(u32)|gray bytes``."""

    class _Img:
        def __init__(self, w, h, body):
            self.width, self.height = w, h
            self._arr = np.frombuffer(body, np.uint8).reshape(h, w)

        def __array__(self, dtype=None, copy=None):
            return self._arr

    @classmethod
    def open(cls, fp: io.BytesIO):
        buf = fp.read()
        assert buf[:4] == b"RAW!"
        w, h = struct.unpack("<II", buf[4:12])
        return cls._Img(w, h, buf[12 : 12 + w * h])


def test_codec_path_dispatch():
    """Non-FIMG payloads route through the codec selected at __init__;
    FIMG payloads keep using the stub in the same batch."""
    raw = b"RAW!" + struct.pack("<II", 4, 2) + bytes(range(8))
    fimg = encode_fake_image("x")
    dec = ImageDecoder(codec=_FakePILImage)
    t = dec(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "image": pa.array([raw, fimg], pa.binary()),
    }))
    assert t["width"][0].as_py() == 4 and t["height"][0].as_py() == 2
    assert t["channels"][0].as_py() == 1  # 2-D array → grayscale
    assert t["mean_pixel"][0].as_py() == round(np.arange(8).mean(), 4)
    assert t["width"][1].as_py() == struct.unpack("<III", fimg[4:16])[0]


def test_no_codec_no_magic_fails_loudly():
    dec = ImageDecoder()
    if dec.codec is not None:
        pytest.skip("a real image codec is installed")
    with pytest.raises(NotImplementedError):
        dec(pa.table({"doc_id": pa.array([1], pa.int64()),
                      "image": pa.array([b"\x89PNG fake"], pa.binary())}))
    with pytest.raises(NotImplementedError):
        ImageDecoder(allow_stub=False)
