"""Corpus ingest: the per-row content sha256 invariant.

``BASELINE.json`` ``input_hint`` requires per-row ``content`` sha256
equality with an independent oracle. The reference has no string
functions at all (SURVEY.md §2.7); this is the one string-scalar family
the new engine adds at the ingest edge. The content column is projected
away immediately after hashing — wide string payloads must never reach
a shuffle (SURVEY.md §7.5.7).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _sha256_batch(batch: pa.Table) -> pa.Table:
    # hashlib per value; the loop is over one batch's values only and each
    # hash is C-speed — this stage is compute-bound by design, and it is
    # the *only* stage that ever touches `content` bytes.
    col = batch.column("content")
    digests = np.empty(len(col), dtype=object)
    for i, v in enumerate(col):
        s = v.as_py()
        digests[i] = hashlib.sha256(s.encode("utf-8")).hexdigest() if s is not None else None
    return batch.append_column("content_sha256", pa.array(digests, type=pa.string()))


def with_content_sha256(ds, drop_content: bool = True):
    """Append ``content_sha256``; optionally drop the wide ``content``
    column right away so later stages shuffle only narrow rows."""
    out = ds.map_batches(_sha256_batch, batch_format="pyarrow")
    if drop_content:
        out = out.drop_columns(["content"])
    return out


def sha256_oracle(values: list[str | None]) -> list[str | None]:
    """Driver-side independent oracle for tests."""
    return [None if v is None else hashlib.sha256(v.encode("utf-8")).hexdigest() for v in values]
