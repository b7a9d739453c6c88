"""Multimodal plumbing: binary columns through actor-pool stages."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.functions.multimodal import (
    DecodeMedia, decode_media, extract_features, sample_frames, synth_media_table)


@pytest.fixture(scope="module")
def media():
    return ray.data.from_arrow(synth_media_table(num_rows=48))


def test_decode_roundtrips_header(media):
    out = decode_media(media).to_pandas()
    assert out["decoded"].all()
    assert (out["dec_width"] == out["width"]).all()
    assert (out["dec_height"] == out["height"]).all()
    assert (out["dec_frames"] == out["num_frames"]).all()


def test_decode_strict_raises_on_unknown_payload():
    # truncated/corrupt PNG signature (missing \x1a\n) matches no parser
    t = pa.table({
        "media_id": pa.array([0], type=pa.int64()),
        "modality": pa.array(["image"]),
        "payload": pa.array([b"\x89PNG\r\n...not-fake..."], type=pa.binary()),
    })
    with pytest.raises(NotImplementedError):
        DecodeMedia(strict=True)(t)


def _png_bytes(w: int, h: int) -> bytes:
    import struct as _s
    import zlib

    ihdr = _s.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR" + ihdr
            + _s.pack(">I", zlib.crc32(b"IHDR" + ihdr)))


def _jpeg_bytes(w: int, h: int, progressive: bool = False) -> bytes:
    import struct as _s

    app0 = b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + _s.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = b"\xff\xdb" + _s.pack(">H", 67) + b"\x00" + bytes(64)
    sof = (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + _s.pack(">HBHHB", 17, 8, h, w, 3) \
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + app0 + dqt + sof + b"\xff\xd9"


def _gif_bytes(w: int, h: int) -> bytes:
    import struct as _s

    return b"GIF89a" + _s.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def test_decode_real_image_headers():
    payloads = [_png_bytes(640, 480), _jpeg_bytes(123, 77),
                _jpeg_bytes(2000, 1500, progressive=True),
                _gif_bytes(31, 17)]
    t = pa.table({
        "media_id": pa.array(range(len(payloads)), type=pa.int64()),
        "modality": pa.array(["image"] * len(payloads)),
        "payload": pa.array(payloads, type=pa.binary()),
    })
    out = DecodeMedia(strict=True)(t).to_pandas()
    assert out["decoded"].all()
    assert list(out["dec_format"]) == ["png", "jpeg", "jpeg", "gif"]
    assert list(out["dec_width"]) == [640, 123, 2000, 31]
    assert list(out["dec_height"]) == [480, 77, 1500, 17]
    assert list(out["dec_frames"]) == [1, 1, 1, 1]


def test_decode_mixed_real_and_fake(media):
    # real image rows interleave with FAKE rows in one batch
    fake = synth_media_table(num_rows=4)
    real = pa.table({
        "media_id": pa.array([100, 101], type=pa.int64()),
        "modality": pa.array(["image", "image"]),
        "payload": pa.array([_png_bytes(8, 9), _jpeg_bytes(10, 11)],
                            type=pa.binary()),
        "width": pa.array([8, 10], type=pa.int32()),
        "height": pa.array([9, 11], type=pa.int32()),
        "num_frames": pa.array([1, 1], type=pa.int32()),
    })
    out = DecodeMedia(strict=True)(
        pa.concat_tables([fake, real])).to_pandas()
    assert out["decoded"].all()
    assert (out["dec_width"] == out["width"]).all()
    assert (out["dec_height"] == out["height"]).all()
    assert list(out["dec_format"][:4]) == ["fake"] * 4
    assert list(out["dec_format"][4:]) == ["png", "jpeg"]


def test_decode_malformed_jpeg_not_decoded():
    # SOS before any SOF → dims unrecoverable; non-strict marks row
    bad = b"\xff\xd8\xff\xda\x00\x04\x00\x00rest"
    t = pa.table({
        "media_id": pa.array([0], type=pa.int64()),
        "modality": pa.array(["image"]),
        "payload": pa.array([bad], type=pa.binary()),
    })
    out = DecodeMedia(strict=False)(t).to_pandas()
    assert not out["decoded"].any()
    with pytest.raises(NotImplementedError):
        DecodeMedia(strict=True)(t)


def test_feature_extraction_shape(media):
    out = extract_features(media).to_pandas()
    assert len(out) == 48
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (48, 8)
    assert np.isfinite(feats).all()
    # deterministic
    out2 = extract_features(media).to_pandas()
    assert np.array_equal(feats, np.stack(out2["feature"].to_numpy()))


def test_frame_sampling(media):
    out = sample_frames(media, every_k=4).to_pandas()
    src = media.to_pandas()
    vids = src[src.modality == "video"]
    expect = int(sum(-(-f // 4) for f in vids["num_frames"]))
    assert len(out) == expect
    assert (out["frame_index"] % 4 == 0).all()
    assert set(out["media_id"]) == set(vids["media_id"])


def test_resize_images_roundtrip(media):
    """Resize stage rewrites the fake header to the target dims,
    subsamples the body deterministically, and the result decodes."""
    from centrality_gpu_ray.functions.multimodal import resize_images

    out = resize_images(media, target_w=24, target_h=20).materialize()
    dec = decode_media(out).to_pandas()
    assert len(dec) == 48
    assert dec["decoded"].all()
    assert (dec["dec_width"] == 24).all()
    assert (dec["dec_height"] == 20).all()
    src = media.to_pandas().set_index("media_id")
    got = out.to_pandas().set_index("media_id")
    # frame count carried over; body bounded by target area
    assert (dec.set_index("media_id")["dec_frames"]
            == src["num_frames"]).all()
    for mid, row in got.iterrows():
        assert len(row["payload"]) <= 17 + min(24 * 20, 512)
    # deterministic: same input → same bytes
    again = resize_images(media, target_w=24, target_h=20) \
        .to_pandas().set_index("media_id")
    assert (got["payload"] == again["payload"]).all()
