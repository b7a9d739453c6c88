"""Cross-run incremental MinHash near-dedup: three-run protocol
(internal dup settled in-run, cross-run near-dup caught from persisted
signature state, full replay drops to empty)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from centrality_gpu_ray.functions.dedup import minhash_dedup_incremental


def _doc(i: int, text: str) -> dict:
    return {"doc_id": i, "text": text}


_BASE = ("the quick brown fox jumps over the lazy dog again and again "
         "while the calm river flows past the old stone bridge")
_ALT = ("completely different content about distributed data "
        "processing engines and arrow columnar batches for scale")


def _tbl(rows):
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
        "text": pa.array([r["text"] for r in rows], type=pa.string()),
    })


def test_three_run_incremental(ray_session, tmp_path):
    state = str(tmp_path / "mh_state")

    # run 1: 1 and 2 are near-dups of each other (internal), 3 distinct
    run1 = _tbl([_doc(1, _BASE), _doc(2, _BASE + " extra tail"),
                 _doc(3, _ALT)])
    surv1, dir1 = minhash_dedup_incremental(
        ray.data.from_arrow(run1), state, num_partitions=4)
    ids1 = sorted(surv1.to_pandas()["doc_id"])
    assert ids1 == [1, 3]  # min doc_id wins the internal cluster
    assert os.path.basename(dir1) == "run=0"

    # run 2: 10 near-dups run-1's surviving doc 1 (cross-run), 11 fresh
    run2 = _tbl([_doc(10, _BASE + " tiny suffix"),
                 _doc(11, "an entirely novel document about maritime "
                          "navigation and celestial charts at night")])
    surv2, dir2 = minhash_dedup_incremental(
        ray.data.from_arrow(run2), state, num_partitions=4)
    ids2 = sorted(surv2.to_pandas()["doc_id"])
    assert ids2 == [11]
    assert os.path.basename(dir2) == "run=1"

    # run 3: replay run 1 verbatim — identical signatures estimate
    # J=1.0 against state, every row drops
    surv3, dir3 = minhash_dedup_incremental(
        ray.data.from_arrow(run1), state, num_partitions=4)
    assert surv3.count() == 0
    assert os.path.basename(dir3) == "run=2"
    # run=2 persists nothing but stays an (empty) claimed partition
    assert sorted(os.path.basename(d) for d in
                  glob.glob(os.path.join(state, "run=*"))) == \
        ["run=0", "run=1", "run=2"]

    # state holds exactly the survivors' signatures
    import pyarrow.parquet as pq
    persisted = sorted(
        int(v) for d in glob.glob(os.path.join(state, "run=*"))
        for p in glob.glob(os.path.join(d, "*.parquet"))
        for v in pq.read_table(p, columns=["doc_id"])
        .column("doc_id").to_pylist())
    assert persisted == [1, 3, 11]


def test_first_run_no_state(ray_session, tmp_path):
    state = str(tmp_path / "mh_state")
    surv, run_dir = minhash_dedup_incremental(
        ray.data.from_arrow(_tbl([_doc(5, _BASE)])), state,
        num_partitions=4)
    assert sorted(surv.to_pandas()["doc_id"]) == [5]
    assert os.path.isdir(run_dir)


def test_cross_pairs_unit():
    """_cross_pairs: new×old only, per-bucket, deterministic cap."""
    import pyarrow as pa

    from centrality_gpu_ray.functions.dedup import _cross_pairs

    t = pa.table({
        "band": pa.array([0] * 5 + [1] * 3, type=pa.int64()),
        "band_hash": pa.array([7] * 5 + [9] * 3, type=pa.int64()),
        "doc_id": pa.array([1, 2, 10, 11, 12, 3, 20, 21],
                           type=pa.int64()),
        "is_new": pa.array([False, False, True, True, True,
                            False, True, True]),
    })
    out = _cross_pairs(t)
    pairs = sorted(zip(out.column("a").to_pylist(),
                       out.column("b").to_pylist()))
    # bucket (0,7): new {10,11,12} x old {1,2}; bucket (1,9):
    # new {20,21} x old {3}
    assert pairs == [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1),
                     (12, 2), (20, 3), (21, 3)]
    # cap=2: only the first 2 sorted ids per side
    capped = _cross_pairs(t, cap=2)
    cp = sorted(zip(capped.column("a").to_pylist(),
                    capped.column("b").to_pylist()))
    assert cp == [(10, 1), (10, 2), (11, 1), (11, 2), (20, 3), (21, 3)]
    # empty input keeps the schema
    empty = _cross_pairs(t.slice(0, 0))
    assert empty.num_rows == 0 and empty.column_names == ["a", "b"]


def test_param_mismatch_rejected(ray_session, tmp_path):
    state = str(tmp_path / "mh_state")
    minhash_dedup_incremental(
        ray.data.from_arrow(_tbl([_doc(1, _BASE)])), state,
        num_partitions=4)
    with pytest.raises(ValueError, match="not comparable"):
        minhash_dedup_incremental(
            ray.data.from_arrow(_tbl([_doc(2, _ALT)])), state,
            num_perm=128, num_partitions=4)
    # matching params keep working
    surv, _ = minhash_dedup_incremental(
        ray.data.from_arrow(_tbl([_doc(2, _ALT)])), state,
        num_partitions=4)
    assert sorted(surv.to_pandas()["doc_id"]) == [2]
