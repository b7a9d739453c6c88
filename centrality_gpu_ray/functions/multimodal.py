"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque Arrow ``binary`` columns with a
typed metadata header. The Ray-side plumbing — schema, actor-pool
stages, batch sizing for wide rows, output layout — is real and tested;
the *codec* itself is stubbed (no image/audio libraries in this
container) behind a clearly-marked seam: ``DecodeMedia`` parses our
deterministic fake header, and :data:`HAVE_REAL_CODECS` documents where
a real decoder (PIL / torchaudio / pyav) would be slotted in.

Batch-size guidance (ray_guide "Memory-aware"): payloads here are
KB-scale fakes, but the stages default to small ``batch_size`` (64) the
way a real image pipeline must, so a batch × concurrency of multi-MB
rows stays inside a worker's heap.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa

HAVE_REAL_CODECS = False  # no PIL/libav in this environment — stub decode

_MAGIC = b"FAKE"
# fake header: magic | modality u8 | width u32 | height u32 | frames u32


def synth_media_table(num_rows: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media table: (media_id, modality, payload, meta)."""
    rng = np.random.default_rng(seed)
    modalities = np.asarray(["image", "audio", "video"])[rng.integers(0, 3, num_rows)]
    payloads, widths, heights, frames = [], [], [], []
    for i in range(num_rows):
        w = int(rng.integers(16, 64))
        h = int(rng.integers(16, 64))
        f = int(rng.integers(1, 16)) if modalities[i] == "video" else 1
        body = rng.integers(0, 256, size=min(w * h, 512), dtype=np.uint8).tobytes()
        m = {"image": 0, "audio": 1, "video": 2}[modalities[i]]
        payloads.append(_MAGIC + struct.pack("<BIII", m, w, h, f) + body)
        widths.append(w)
        heights.append(h)
        frames.append(f)
    return pa.table({
        "media_id": pa.array(np.arange(num_rows, dtype=np.int64)),
        "modality": pa.array(modalities, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(widths, type=pa.int32()),
        "height": pa.array(heights, type=pa.int32()),
        "num_frames": pa.array(frames, type=pa.int32()),
    })


class DecodeMedia:
    """Actor-pool decode stage. With real codecs this __init__ would load
    the codec context once per actor; __call__ decodes a batch. The stub
    parses the fake header and validates it against the metadata columns
    — raising on real (non-FAKE) payloads so misuse is loud."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload")
        widths = np.zeros(len(payloads), dtype=np.int32)
        heights = np.zeros(len(payloads), dtype=np.int32)
        frames = np.zeros(len(payloads), dtype=np.int32)
        ok = np.zeros(len(payloads), dtype=bool)
        for i, v in enumerate(payloads):
            buf = v.as_py()
            if buf[:4] != _MAGIC:
                if self.strict:
                    raise NotImplementedError(
                        "real media decode requires PIL/pyav — not available "
                        "in this environment (stub decodes FAKE headers only)")
                continue
            _, w, h, f = struct.unpack("<BIII", buf[4:17])
            widths[i], heights[i], frames[i], ok[i] = w, h, f, True
        return (batch.append_column("dec_width", pa.array(widths))
                .append_column("dec_height", pa.array(heights))
                .append_column("dec_frames", pa.array(frames))
                .append_column("decoded", pa.array(ok)))


def decode_media(ds, concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(DecodeMedia, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency, num_cpus=0.5)


class FeatureExtract:
    """Fake feature extractor: deterministic 8-dim payload statistics —
    where a real model forward pass would run (batched, per-actor
    weights). Output is a fixed-size list<float> column, the shape a
    downstream ANN stage consumes."""

    DIM = 8

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.zeros((len(batch), self.DIM), dtype=np.float32)
        for i, v in enumerate(batch.column("payload")):
            body = np.frombuffer(v.as_py()[17:], dtype=np.uint8)
            if body.size == 0:
                continue
            feats[i] = [body.mean(), body.std(), body.min(), body.max(),
                        np.percentile(body, 25), np.percentile(body, 50),
                        np.percentile(body, 75), float(body.size)]
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel()), self.DIM),
        })


def extract_features(ds, concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(FeatureExtract, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency, num_cpus=0.5)


def sample_frames(ds, every_k: int = 4, concurrency: int = 2):
    """Frame sampling for video rows: expands each video row to one row
    per sampled frame index (flat_map-shaped, done vectorized per batch)."""
    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vids = batch.filter(pc.equal(batch.column("modality"), "video"))
        if vids.num_rows == 0:
            return pa.table({"media_id": pa.array([], type=pa.int64()),
                             "frame_index": pa.array([], type=pa.int64())})
        nf = vids.column("num_frames").to_numpy().astype(np.int64)
        counts = -(-nf // every_k)
        mids = np.repeat(vids.column("media_id").to_numpy(), counts)
        idx = np.concatenate([np.arange(0, f, every_k, dtype=np.int64) for f in nf])
        return pa.table({"media_id": pa.array(mids), "frame_index": pa.array(idx)})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256,
                          concurrency=concurrency, num_cpus=0.5)
