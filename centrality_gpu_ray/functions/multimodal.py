"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque Arrow ``binary`` columns with a
typed metadata header. The Ray-side plumbing — schema, actor-pool
stages, batch sizing for wide rows, output layout — is real and tested.
``DecodeMedia`` parses REAL image headers in pure numpy (PNG IHDR,
GIF87a/89a logical screen, JPEG SOFn marker walk) plus the
deterministic fake header the oracle gate hash-checks; the remaining
stub seam is full pixel decode and audio/video codecs (no
PIL/torchaudio/pyav in this container) — :data:`HAVE_REAL_CODECS`
documents where those would slot in.

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

from centrality_gpu_ray.nputil import ragged_arange as _ragged_arange

HAVE_REAL_CODECS = False  # no PIL/libav in this environment — stub decode

_MAGIC = b"FAKE"
# fake header: magic | modality u8 | width u32 | height u32 | frames u32



def _payload_array(out_offs: "np.ndarray", flat: "np.ndarray"):
    """Packed payload bytes → Arrow binary column. binary() carries
    int32 offsets, which would WRAP SILENTLY past 2 GiB of payload in
    one batch — switch to large_binary (8-byte offsets) there;
    ``_binary_buffers`` decodes both widths."""
    n = out_offs.size - 1
    if int(out_offs[-1]) < 2 ** 31:
        return pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(out_offs.astype(np.int32).tobytes()),
             pa.py_buffer(flat.tobytes())])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(out_offs.tobytes()),
         pa.py_buffer(flat.tobytes())])

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



def media_from_documents(docs_ds, batch_size: int = 1024):
    """Pack a deterministic FAKE media payload per document row:
    header fields are closed-form functions of ``doc_id`` (modality =
    doc_id % 3, width = 16 + doc_id % 48, height = 16 + (doc_id//7) %
    48, frames = 1 + doc_id % 15 for video else 1) and the body is the
    document's UTF-8 text bytes. Because every field is derivable from
    (doc_id, text), the decode→feature chain over the packed BINARY
    column is value-checkable against a pure-SQL oracle — the binary
    plumbing (pack → Arrow binary column → header parse in the decode
    stage) is genuinely exercised and hash-checked end to end.
    Packing is vectorized over the batch (one flat uint8 buffer, fancy
    index scatter — same construction as ``ResizeImages``)."""
    _MODS = np.asarray(["image", "audio", "video"])

    def pack(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = ids.size
        texts = batch.column("text").to_pandas().fillna("")
        enc = [t.encode("utf-8") for t in texts]
        blens = np.asarray([len(e) for e in enc], dtype=np.int64)
        modal = (ids % 3).astype(np.uint8)
        hdr = np.zeros((n, 17), dtype=np.uint8)
        hdr[:, :4] = np.frombuffer(_MAGIC, dtype=np.uint8)
        hdr[:, 4] = modal
        hdr[:, 5:9] = (16 + ids % 48).astype("<u4")[:, None].view(np.uint8)
        hdr[:, 9:13] = (16 + (ids // 7) % 48).astype("<u4")[:, None] \
            .view(np.uint8)
        frames = np.where(modal == 2, 1 + ids % 15, 1).astype("<u4")
        hdr[:, 13:17] = frames[:, None].view(np.uint8)
        out_lens = 17 + blens
        out_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(out_lens, out=out_offs[1:])
        flat = np.empty(int(out_lens.sum()), dtype=np.uint8)
        hdr_idx = (np.repeat(out_offs[:-1], 17)
                   + np.tile(np.arange(17), n))
        flat[hdr_idx] = hdr.ravel()
        body_idx = np.repeat(out_offs[:-1] + 17, blens) \
            + _ragged_arange(blens)
        if body_idx.size:
            flat[body_idx] = np.frombuffer(b"".join(enc), dtype=np.uint8)
        payload = _payload_array(out_offs, flat)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "modality": pa.array(_MODS[ids % 3], type=pa.string()),
            "payload": payload,
        })

    pack.__name__ = "pack_media_payloads"
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        pack, batch_format="pyarrow", batch_size=batch_size)


class HeaderFeatures:
    """Decode-derived, SQL-checkable feature row per media payload:
    the parsed header dims plus body length and body sha256 — the
    checksum proves the binary body round-tripped bit-exactly through
    the pack → Arrow binary → decode chain (sha256 per row is the same
    per-row crypto kernel as the ingest stage's content hash)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        offs, data = _binary_buffers(batch.column("payload"))
        n = offs.size - 1
        starts = np.minimum(offs[:-1] + 17, offs[1:])
        mv = memoryview(data)
        digs = [hashlib.sha256(mv[starts[i]:offs[i + 1]]).hexdigest()
                for i in range(n)]
        return pa.table({
            "media_id": batch.column("media_id"),
            "dec_width": batch.column("dec_width"),
            "dec_height": batch.column("dec_height"),
            "dec_frames": batch.column("dec_frames"),
            "n_body_bytes": pa.array(
                (offs[1:] - starts).astype(np.int64)),
            "body_sha256": pa.array(digs, type=pa.string()),
        })


def header_features(ds, concurrency: int = 2, batch_size: int = 256):
    return ds.map_batches(HeaderFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=0.5)


def _binary_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow binary column → (byte offsets int64, flat data uint8),
    zero-copy views of the Arrow buffers — the whole batch's payload
    bytes addressable as ONE numpy array (no per-row as_py())."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        raise ValueError("media payload column must not contain nulls")
    width = 8 if pa.types.is_large_binary(arr.type) else 4
    dt = np.int64 if width == 8 else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=dt)[arr.offset:arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    return offs.astype(np.int64), data


_PNG_SIG = np.frombuffer(b"\x89PNG\r\n\x1a\n", dtype=np.uint8)
_IHDR = np.frombuffer(b"IHDR", dtype=np.uint8)
# JPEG start-of-frame markers that carry the image dimensions (all
# baseline/progressive/lossless/arith variants; NOT C4/C8/CC which are
# DHT/JPG/DAC)
_JPEG_SOF = frozenset({0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                       0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF})


def _jpeg_dims(buf: np.ndarray):
    """(width, height) from a JPEG byte stream by walking the marker
    segments to the first SOFn — pure numpy/ints, no codec library.
    Only the few-dozen header bytes are touched; returns None on a
    malformed stream (caller marks the row undecoded)."""
    i, n = 2, buf.size
    while i + 1 < n:
        if buf[i] != 0xFF:
            return None  # lost marker sync
        marker = int(buf[i + 1])
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # TEM/RSTn/SOI
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / start-of-scan before SOF
            return None
        if i + 3 >= n:
            return None
        seglen = (int(buf[i + 2]) << 8) | int(buf[i + 3])
        if marker in _JPEG_SOF:
            if i + 9 > n or seglen < 7:
                return None
            h = (int(buf[i + 5]) << 8) | int(buf[i + 6])
            w = (int(buf[i + 7]) << 8) | int(buf[i + 8])
            return w, h
        if seglen < 2:
            return None
        i += 2 + seglen
    return None


class DecodeMedia:
    """Actor-pool decode stage. With real codecs this __init__ would
    load the codec context once per actor; __call__ decodes a batch.

    IMAGE HEADERS ARE REAL: PNG (IHDR width/height, big-endian u32 at
    fixed offsets — vectorized over the batch), GIF87a/89a (logical
    screen u16le at fixed offsets — vectorized) and JPEG (marker-segment
    walk to the first SOFn — per-row over header bytes only, the same
    shape a real codec's header sniff has). The deterministic FAKE
    header remains the oracle-checkable format (fixed-offset, fully
    vectorized). Full pixel/audio/video decode is the remaining stub
    seam — strict mode raises on payloads none of these parsers
    accept."""

    _HDR = 17  # magic(4) | modality u8 | width u32 | height u32 | frames u32

    def __init__(self, strict: bool = True):
        self.strict = strict
        self._magic = np.frombuffer(_MAGIC, dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs, data = _binary_buffers(batch.column("payload"))
        n = offs.size - 1
        lens = offs[1:] - offs[:-1]
        ok = np.zeros(n, dtype=bool)
        widths = np.zeros(n, dtype=np.int32)
        heights = np.zeros(n, dtype=np.int32)
        frames = np.zeros(n, dtype=np.int32)
        fmt = np.full(n, "", dtype=object)

        # FAKE header rows (vectorized fixed-offset parse)
        rows = np.flatnonzero(lens >= self._HDR)
        if rows.size:
            hdr = data[offs[rows, None] + np.arange(self._HDR)]  # (k, 17)
            magic_ok = (hdr[:, :4] == self._magic).all(axis=1)
            rows, hdr = rows[magic_ok], hdr[magic_ok]
            fields = np.ascontiguousarray(hdr[:, 5:17]).view("<u4")
            widths[rows] = fields[:, 0].astype(np.int32)
            heights[rows] = fields[:, 1].astype(np.int32)
            frames[rows] = fields[:, 2].astype(np.int32)
            ok[rows] = True
            fmt[rows] = "fake"

        # PNG rows: sig(8) | IHDR length(4) | "IHDR"(4) | w u32be | h u32be
        rows = np.flatnonzero(~ok & (lens >= 24))
        if rows.size:
            pre = data[offs[rows, None] + np.arange(24)]  # (k, 24)
            is_png = ((pre[:, :8] == _PNG_SIG).all(axis=1)
                      & (pre[:, 12:16] == _IHDR).all(axis=1))
            rows, pre = rows[is_png], pre[is_png]
            be = pre[:, 16:24].astype(np.int64)
            widths[rows] = ((be[:, 0] << 24) | (be[:, 1] << 16)
                            | (be[:, 2] << 8) | be[:, 3]).astype(np.int32)
            heights[rows] = ((be[:, 4] << 24) | (be[:, 5] << 16)
                             | (be[:, 6] << 8) | be[:, 7]).astype(np.int32)
            frames[rows] = 1
            ok[rows] = True
            fmt[rows] = "png"

        # GIF rows: "GIF87a"/"GIF89a" | w u16le | h u16le
        rows = np.flatnonzero(~ok & (lens >= 10))
        if rows.size:
            pre = data[offs[rows, None] + np.arange(10)]  # (k, 10)
            is_gif = ((pre[:, :3] == np.frombuffer(b"GIF", np.uint8))
                      .all(axis=1)
                      & ((pre[:, 3:6] == np.frombuffer(b"87a", np.uint8))
                         .all(axis=1)
                         | (pre[:, 3:6] == np.frombuffer(b"89a", np.uint8))
                         .all(axis=1)))
            rows, pre = rows[is_gif], pre[is_gif]
            le = pre[:, 6:10].astype(np.int32)
            widths[rows] = le[:, 0] | (le[:, 1] << 8)
            heights[rows] = le[:, 2] | (le[:, 3] << 8)
            frames[rows] = 1
            ok[rows] = True
            fmt[rows] = "gif"

        # JPEG rows: FFD8FF prefix, then a marker walk per row (touches
        # only header bytes; body bytes are never read)
        rows = np.flatnonzero(~ok & (lens >= 4))
        if rows.size:
            pre = data[offs[rows, None] + np.arange(3)]
            is_jpg = (pre == np.asarray([0xFF, 0xD8, 0xFF],
                                        np.uint8)).all(axis=1)
            for r in rows[is_jpg]:
                dims = _jpeg_dims(data[offs[r]:offs[r + 1]])
                if dims is not None:
                    widths[r], heights[r] = dims
                    frames[r] = 1
                    ok[r] = True
                    fmt[r] = "jpeg"

        if self.strict and not ok.all():
            raise NotImplementedError(
                "payload is none of FAKE/PNG/GIF/JPEG — full pixel and "
                "audio/video decode requires PIL/pyav, not available in "
                "this environment")
        return (batch.append_column("dec_width", pa.array(widths))
                .append_column("dec_height", pa.array(heights))
                .append_column("dec_frames", pa.array(frames))
                .append_column("dec_format",
                               pa.array(fmt, type=pa.string()))
                .append_column("decoded", pa.array(ok)))


def decode_media(ds, concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(DecodeMedia, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency, num_cpus=0.5)


class FeatureExtract:
    """Fake feature extractor: deterministic 8-dim payload statistics —
    where a real model forward pass would run (batched, per-actor
    weights). Output is a fixed-size list<float> column, the shape a
    downstream ANN stage consumes. Fully vectorized over the batch: the
    bodies are addressed as one flat uint8 view of the Arrow data
    buffer, moments via segment ``reduceat``, percentiles via one
    batch-wide lexsort + interpolated gather (matches ``np.percentile``
    linear interpolation bit-for-bit)."""

    DIM = 8
    _HDR = 17

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs, data = _binary_buffers(batch.column("payload"))
        n = offs.size - 1
        feats = np.zeros((n, self.DIM), dtype=np.float32)
        starts = np.minimum(offs[:-1] + self._HDR, offs[1:])
        lens = offs[1:] - starts
        nz = np.flatnonzero(lens)
        if nz.size:
            seg_ids = np.repeat(np.arange(n), lens)  # nz segments only
            body = data[np.repeat(starts, lens)
                        + _ragged_arange(lens)].astype(np.float64)
            seg = np.zeros(nz.size, dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=seg[1:])
            L = lens[nz].astype(np.float64)
            s1 = np.add.reduceat(body, seg)
            s2 = np.add.reduceat(body * body, seg)
            mean = s1 / L
            std = np.sqrt(np.maximum(s2 / L - mean * mean, 0.0))
            # batch-wide within-segment sort for exact percentiles
            order = np.lexsort((body, seg_ids))
            srt = body[order]
            for j, q in enumerate((0.25, 0.50, 0.75)):
                pos = (L - 1.0) * q
                lo = np.floor(pos).astype(np.int64)
                frac = pos - lo
                vlo = srt[seg + lo]
                vhi = srt[seg + np.minimum(lo + 1, lens[nz] - 1)]
                feats[nz, 4 + j] = vlo + frac * (vhi - vlo)
            feats[nz, 0] = mean
            feats[nz, 1] = std
            feats[nz, 2] = np.minimum.reduceat(body, seg)
            feats[nz, 3] = np.maximum.reduceat(body, seg)
            feats[nz, 7] = L
        return pa.table({
            "media_id": batch.column("media_id"),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel()), self.DIM),
        })


def extract_features(ds, concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(FeatureExtract, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency, num_cpus=0.5)


class ResizeImages:
    """Actor-pool resize stage — with real codecs this is the
    decode→interpolate→re-encode hot loop (per-actor codec context in
    ``__init__``); the stub resizes the FAKE payload deterministically:
    header rewritten to (target_w, target_h), body subsampled with a
    fixed stride so output bytes are a pure function of input bytes.
    Vectorized over the batch's Arrow buffers like DecodeMedia."""

    _HDR = 17

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw, self.th = int(target_w), int(target_h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs, data = _binary_buffers(batch.column("payload"))
        n = offs.size - 1
        body_starts = np.minimum(offs[:-1] + self._HDR, offs[1:])
        body_lens = offs[1:] - body_starts
        # target body length ∝ target area, capped by source length
        want = np.minimum(body_lens,
                          np.minimum(self.tw * self.th, 512)).astype(np.int64)
        # stride-subsample each body: index i → floor(i·len/want)
        pos = _ragged_arange(want)
        scale = np.repeat(
            np.where(want > 0, body_lens / np.maximum(want, 1), 0.0), want)
        src_idx = (np.repeat(body_starts, want)
                   + np.minimum((pos * scale).astype(np.int64),
                                np.repeat(np.maximum(body_lens - 1, 0),
                                          want)))
        new_bodies = data[src_idx] if src_idx.size else \
            np.empty(0, np.uint8)
        # rebuild payloads: fake header with the new dims; modality and
        # frame count carried over from the source headers
        has_hdr = (offs[1:] - offs[:-1]) >= self._HDR
        modal = np.zeros(n, dtype=np.uint8)
        frames = np.ones(n, dtype="<u4")
        rows = np.flatnonzero(has_hdr)
        if rows.size:
            src_hdr = data[offs[rows, None] + np.arange(self._HDR)]
            modal[rows] = src_hdr[:, 4]
            frames[rows] = np.ascontiguousarray(
                src_hdr[:, 13:17]).view("<u4").ravel()
        hdr = np.zeros((n, self._HDR), dtype=np.uint8)
        hdr[:, :4] = np.frombuffer(_MAGIC, dtype=np.uint8)
        hdr[:, 4] = modal
        hdr[:, 5:9] = np.full(n, self.tw, "<u4")[:, None].view(np.uint8)
        hdr[:, 9:13] = np.full(n, self.th, "<u4")[:, None].view(np.uint8)
        hdr[:, 13:17] = frames[:, None].view(np.uint8)
        out_lens = self._HDR + want
        out_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(out_lens, out=out_offs[1:])
        flat = np.empty(int(out_lens.sum()), dtype=np.uint8)
        hdr_idx = (np.repeat(out_offs[:-1], self._HDR)
                   + np.tile(np.arange(self._HDR), n))
        flat[hdr_idx] = hdr.ravel()
        body_idx = np.repeat(out_offs[:-1] + self._HDR, want) + pos
        flat[body_idx] = new_bodies
        payload = _payload_array(out_offs, flat)
        return pa.table({
            "media_id": batch.column("media_id"),
            "payload": payload,
            "width": pa.array(np.full(n, self.tw, dtype=np.int32)),
            "height": pa.array(np.full(n, self.th, dtype=np.int32)),
        })


def resize_images(ds, target_w: int = 32, target_h: int = 32,
                  concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(ResizeImages, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=0.5,
                          fn_constructor_args=(target_w, target_h))


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
