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


# --------------------------------------------------------------------------
# resize / audio / video frame-sample stages
# --------------------------------------------------------------------------

from cloud_dedup_ray.pipelines.multimodal import (  # noqa: E402
    _AMAGIC,
    _VMAGIC,
    AudioFeatures,
    ImageResizer,
    VideoFrameSampler,
    audio_features,
    encode_fake_audio,
    encode_fake_video,
    image_resize_features,
    video_frame_features,
)


def test_resizer_nearest_neighbor_exact():
    """2×2 gray checkerboard → 4×4 NN upsample has a known block layout."""
    arr = np.array([[0, 255], [255, 0]], np.uint8)[:, :, None]
    buf = b"FIMG" + struct.pack("<III", 2, 2, 1) + arr.tobytes()
    out = ImageResizer(width=4, height=4)(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "image": pa.array([buf], pa.binary()),
                  "format": pa.array(["fimg"])})
    )
    rbuf = out["image"][0].as_py()
    w, h, c = struct.unpack("<III", rbuf[4:16])
    assert (w, h, c) == (4, 4, 1)
    got = np.frombuffer(rbuf[16:], np.uint8).reshape(4, 4)
    expect = np.array(
        [[0, 0, 255, 255], [0, 0, 255, 255],
         [255, 255, 0, 0], [255, 255, 0, 0]], np.uint8
    )
    assert (got == expect).all()


def test_image_resize_features_end_to_end():
    out = image_resize_features("/root/testdata/sf0.001", width=24, height=20)
    assert len(out) > 0
    assert (out["width"] == 24).all() and (out["height"] == 20).all()
    assert (out["channels"] == 3).all()
    assert out.equals(
        image_resize_features("/root/testdata/sf0.001", width=24, height=20)
    )


def test_audio_features_known_payload():
    x = np.array([16384, -16384, 16384, -16384], np.int16)
    buf = _AMAGIC + struct.pack("<II", 8000, 4) + x.tobytes()
    t = AudioFeatures()(
        pa.table({"doc_id": pa.array([7], pa.int64()),
                  "audio": pa.array([buf], pa.binary())})
    )
    assert t["sample_rate"][0].as_py() == 8000
    assert t["duration_sec"][0].as_py() == round(4 / 8000, 4)
    assert t["rms"][0].as_py() == 0.5
    assert t["zero_cross_rate"][0].as_py() == 1.0  # alternating signs
    assert t["peak"][0].as_py() == 0.5


def test_audio_features_end_to_end_deterministic():
    out = audio_features("/root/testdata/sf0.001")
    assert len(out) > 0
    assert (out["duration_sec"] > 0).all()
    assert out.equals(audio_features("/root/testdata/sf0.001"))


def test_audio_no_codec_no_magic_fails_loudly():
    dec = AudioFeatures()
    if dec.codec is not None:
        pytest.skip("a real audio codec is installed")
    with pytest.raises(NotImplementedError):
        dec(pa.table({"doc_id": pa.array([1], pa.int64()),
                      "audio": pa.array([b"RIFF fake wav"], pa.binary())}))


def test_frame_sampler_stride_and_fimg_compose():
    vid = encode_fake_video("clip")
    w, h, n_frames = struct.unpack("<III", vid[4:16])
    t = VideoFrameSampler(stride=3)(
        pa.table({"doc_id": pa.array([9], pa.int64()),
                  "video": pa.array([vid], pa.binary())})
    )
    assert t["frame_idx"].to_pylist() == list(range(0, n_frames, 3))
    # sampled frames are valid FIMG → ImageDecoder consumes them directly
    feat = ImageDecoder()(t)
    assert (np.asarray(feat["width"]) == w).all()
    assert (np.asarray(feat["height"]) == h).all()
    assert (np.asarray(feat["channels"]) == 1).all()
    # frame 3's mean matches the raw frame bytes
    body = np.frombuffer(vid[16:], np.uint8).reshape(n_frames, h, w)
    assert feat["mean_pixel"][1].as_py() == round(float(body[3].mean()), 4)


def test_video_frame_features_end_to_end():
    out = video_frame_features("/root/testdata/sf0.001", stride=4)
    assert len(out) > 0
    assert set(out.columns) == {
        "doc_id", "frame_idx", "width", "height", "channels", "mean_pixel",
    }
    assert (out["frame_idx"] % 4 == 0).all()
    assert (out["channels"] == 1).all()
    assert out.equals(video_frame_features("/root/testdata/sf0.001", stride=4))


def test_non_fvid_fails_loudly():
    with pytest.raises(NotImplementedError):
        VideoFrameSampler()(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "video": pa.array([b"\x00\x00\x00\x18ftypmp4 "],
                                        pa.binary())})
        )


def test_dhash64_gray_reference_grid():
    """dHash of a hand-checkable gradient: every row increases left to
    right, so every cell[i,j] < cell[i,j+1] → all 64 bits are 0; the
    reversed gradient sets all bits."""
    from cloud_dedup_ray.pipelines.multimodal import dhash64_gray

    g = np.tile(np.arange(18, dtype=np.float64), (16, 1))
    assert dhash64_gray(g) == 0
    assert dhash64_gray(g[:, ::-1]) == (1 << 64) - 1
    # non-divisible dims use the r*8//h / c*9//w integer partition
    g2 = np.tile(np.arange(23, dtype=np.float64), (19, 1))
    assert dhash64_gray(g2) == 0


def test_image_phash_matches_per_pixel_oracle():
    """The actor-pool phash stage over FIMG payloads must equal the
    independent per-pixel pure-Python oracle, and the dedup pipeline's
    cluster_id must be the min doc_id per exact phash."""
    from cloud_dedup_ray.oracle.pipeline_oracles import oracle_image_phash
    from cloud_dedup_ray.pipelines.multimodal import image_phash_dedup

    got = image_phash_dedup("/root/testdata/sf0.001")
    want = (
        oracle_image_phash("/root/testdata/sf0.001")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["phash"].tolist() == want["phash"].tolist()
    exp_cluster = want.groupby("phash")["doc_id"].transform("min")
    assert got["cluster_id"].tolist() == exp_cluster.tolist()
    # exact-duplicate texts → identical payloads → one cluster
    assert got["cluster_id"].nunique() < len(got)


def test_image_phash_parquet_sink_twin(tmp_path):
    """out_dir writes the same assignment table the DataFrame path
    returns (the at-scale sink contract shared by the per-doc textops
    pipelines)."""
    import pandas as pd

    from cloud_dedup_ray.pipelines.multimodal import image_phash_dedup

    out_dir = str(tmp_path / "phash_sink")
    df = image_phash_dedup("/root/testdata/sf0.001", out_dir=out_dir)
    back = (
        pd.read_parquet(out_dir)
        .sort_values("doc_id")
        .reset_index(drop=True)[df.columns.tolist()]
    )
    pd.testing.assert_frame_equal(back, df, check_exact=True)


def test_phash_no_codec_no_magic_fails_loudly():
    from cloud_dedup_ray.pipelines.multimodal import ImagePHasher

    hasher = ImagePHasher()
    hasher.codec = None
    with pytest.raises(NotImplementedError):
        hasher(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "image": pa.array([b"\x89PNG...."], pa.binary())})
        )


def test_phash_codec_path_dispatch():
    """A PIL-compatible injected codec routes non-FIMG payloads through
    the codec grayscale path (same dispatch contract as ImageDecoder)."""
    from cloud_dedup_ray.pipelines.multimodal import ImagePHasher, dhash64_gray

    arr = (np.arange(24 * 24 * 3) % 251).reshape(24, 24, 3).astype(np.uint8)

    class FakeImg:
        width, height = 24, 24

        def __array__(self, dtype=None, copy=None):
            return arr

    class FakeCodec:
        @staticmethod
        def open(_buf):
            return FakeImg()

    hasher = ImagePHasher(codec=FakeCodec)
    t = hasher(
        pa.table({"doc_id": pa.array([7], pa.int64()),
                  "image": pa.array([b"\x89PNG...."], pa.binary())})
    )
    want = dhash64_gray(arr.astype(np.float64).mean(axis=2))
    assert np.asarray(t["phash"]).view(np.uint64)[0] == want


def test_afp64_energy_delta_reference():
    """Hand-checkable fingerprint: a ramp whose window energies strictly
    increase sets every available delta bit; the reversed ramp clears
    them; sub-2-window inputs fingerprint to 0."""
    from cloud_dedup_ray.pipelines.multimodal import _AFP_WINDOW, afp64_samples

    n_win = 10
    x = np.arange(n_win * _AFP_WINDOW, dtype=np.int16)
    fp = afp64_samples(x)
    k = n_win - 1
    want = int(((1 << k) - 1) << (64 - k))  # top k bits set
    assert fp == want
    assert afp64_samples(x[::-1].copy()) == 0
    assert afp64_samples(np.zeros(_AFP_WINDOW, np.int16)) == 0


def test_audio_video_fingerprint_dedup_match_oracles():
    from cloud_dedup_ray.oracle.pipeline_oracles import (
        oracle_audio_fingerprint,
        oracle_video_fingerprint,
    )
    from cloud_dedup_ray.pipelines.multimodal import (
        audio_fingerprint_dedup,
        video_fingerprint_dedup,
    )

    ga = audio_fingerprint_dedup("/root/testdata/sf0.001")
    wa = (
        oracle_audio_fingerprint("/root/testdata/sf0.001")
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert ga["afp"].tolist() == wa["afp"].tolist()
    assert ga["cluster_id"].tolist() == (
        wa.groupby("afp")["doc_id"].transform("min").tolist()
    )
    # the 37-sample window is coprime to the FAUD payload's 16-sample
    # period, so fingerprints must NOT degenerate to one value
    assert ga["afp"].nunique() > 1
    gv = video_fingerprint_dedup("/root/testdata/sf0.001")
    wv = (
        oracle_video_fingerprint("/root/testdata/sf0.001")
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert gv["vfp"].tolist() == wv["vfp"].tolist()
    assert gv["cluster_id"].tolist() == (
        wv.groupby("vfp")["doc_id"].transform("min").tolist()
    )


def test_ahash64_gray_int_reference_grid():
    """aHash of a half-dark/half-bright frame: bright cells sit above
    the global mean → exactly the 32 bright-side bits set; works down
    to the 8×8 minimum FVID frame."""
    from cloud_dedup_ray.pipelines.multimodal import ahash64_gray_int

    g = np.zeros((8, 8), np.uint8)
    g[:, 4:] = 200
    got = ahash64_gray_int(g)
    want = 0
    for i in range(8):
        for j in range(4, 8):
            want |= 1 << (63 - (i * 8 + j))
    assert got == want
    # constant frame: no cell exceeds the mean → zero hash
    assert ahash64_gray_int(np.full((11, 13), 7, np.uint8)) == 0


def test_video_fingerprint_order_sensitive():
    """Reordering frames must change the chain fingerprint (the fold is
    order-sensitive by design)."""
    import struct as _struct

    from cloud_dedup_ray.pipelines.multimodal import (
        _VMAGIC,
        VideoFingerprinter,
    )

    w = h = 8
    f0 = bytes(range(64))
    f1 = bytes(reversed(range(64)))
    vid_a = _VMAGIC + _struct.pack("<III", w, h, 2) + f0 + f1
    vid_b = _VMAGIC + _struct.pack("<III", w, h, 2) + f1 + f0
    t = VideoFingerprinter()(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "video": pa.array([vid_a, vid_b], pa.binary())})
    )
    vfp = t["vfp"].to_pylist()
    assert vfp[0] != vfp[1]


def test_audio_fingerprint_codec_and_failure_paths():
    from cloud_dedup_ray.pipelines.multimodal import (
        AudioFingerprinter,
        afp64_samples,
    )

    fper = AudioFingerprinter()
    fper.codec = None
    with pytest.raises(NotImplementedError):
        fper(pa.table({"doc_id": pa.array([1], pa.int64()),
                       "audio": pa.array([b"RIFF...."], pa.binary())}))

    samples = (np.arange(400) % 251).astype(np.int16)

    class FakeSf:
        @staticmethod
        def read(_buf, dtype="int16"):
            return samples, 8000

    t = AudioFingerprinter(codec=FakeSf)(
        pa.table({"doc_id": pa.array([3], pa.int64()),
                  "audio": pa.array([b"RIFF...."], pa.binary())})
    )
    assert np.asarray(t["afp"]).view(np.uint64)[0] == afp64_samples(samples)
