"""Edge-list fixture sources (the reference's conformance corpus).

The reference reads a text format — header ``n m`` then ``m`` lines
``u v w`` (0-based int ids, unit weights, undirected) — in
``Graph::Graph(char*)`` (``graph.cpp:38-72``). We keep that format for
conformance fixtures only; the four sample graphs from
``/root/reference/Codes/sample_input`` are embedded verbatim below
(FIXTURES.md §2) so tests do not depend on the reference tree.
"""

from __future__ import annotations

import pyarrow as pa

# (u, v) pairs copied from FIXTURES.md §2 (= sample_input/test{1..4}.txt).
_T1 = [(0, 1), (0, 6), (0, 8), (1, 2), (2, 3), (3, 4), (3, 7), (3, 8),
       (4, 5), (5, 8), (6, 7), (7, 8)]
_T2 = _T1 + [(0, 9), (9, 10), (9, 11), (9, 14), (10, 12), (11, 12),
             (11, 13), (12, 14), (13, 14)]
_T3 = [(0, 1), (0, 2), (1, 2), (2, 3), (2, 5), (3, 4), (3, 5), (4, 5)]
_T4 = _T2 + [(14, 15), (14, 16), (15, 17), (16, 18), (17, 18), (17, 19),
             (17, 20), (18, 19), (19, 20)]
# test5 = test1 ⊎ test3 shifted by +9 — the multi-component fixture
# (FIXTURES.md §3.3); the reference hard-exits on disconnected input
# (graph_ear_decompos.h:141-149), the new engine handles it natively.
_T5 = _T1 + [(u + 9, v + 9) for (u, v) in _T3]

FIXTURE_EDGES: dict[str, list[tuple[int, int]]] = {
    "test1": _T1, "test2": _T2, "test3": _T3, "test4": _T4, "test5": _T5,
}

FIXTURE_NUM_VERTICES = {"test1": 9, "test2": 15, "test3": 6, "test4": 21, "test5": 15}


def fixture_edges_table(name: str) -> pa.Table:
    """Directed (one row per undirected edge) raw edge table for a fixture."""
    pairs = FIXTURE_EDGES[name]
    return pa.table({
        "src": pa.array([u for u, _ in pairs], type=pa.int64()),
        "dst": pa.array([v for _, v in pairs], type=pa.int64()),
        "weight": pa.array([1] * len(pairs), type=pa.int64()),
    })


def parse_edgelist_text(text: str) -> pa.Table:
    """Parse the reference's text format (``ReadMe:6-13``): ``n m`` header
    then ``u v w`` lines. Returns the raw directed edge table."""
    lines = [ln for ln in text.strip().splitlines() if ln.strip()]
    n, m = (int(x) for x in lines[0].split()[:2])
    src, dst, w = [], [], []
    for ln in lines[1 : m + 1]:
        parts = ln.split()
        src.append(int(parts[0]))
        dst.append(int(parts[1]))
        w.append(int(parts[2]) if len(parts) > 2 else 1)
    tbl = pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
        "weight": pa.array(w, type=pa.int64()),
    })
    if tbl.num_rows != m:
        raise ValueError(f"edge-list header claims {m} edges, file has {tbl.num_rows}")
    return tbl


def read_edgelist(path: str) -> pa.Table:
    with open(path) as f:
        return parse_edgelist_text(f.read())


def fixture_dataset(name: str):
    import ray.data

    return ray.data.from_arrow(fixture_edges_table(name))
