"""python -m centrality_gpu_ray — the reference's ./betc user surface
(main.cpp:54-72) driven in-process against the fixture goldens."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from centrality_gpu_ray.__main__ import run
from centrality_gpu_ray.sources.edgelist import FIXTURE_EDGES

from fixtures import GOLDEN_BC, GOLDEN_DEGREES


def _write_edgelist(tmp_path, name):
    pairs = FIXTURE_EDGES[name]
    n = max(max(u, v) for u, v in pairs) + 1
    path = tmp_path / f"{name}.txt"
    path.write_text(
        f"{n} {len(pairs)}\n"
        + "".join(f"{u} {v} 1\n" for u, v in pairs))
    return str(path)


def test_cli_bc_stdout_matches_golden(tmp_path, capsys):
    path = _write_edgelist(tmp_path, "test1")
    assert run([path]) == 0
    out = capsys.readouterr().out
    got = {int(l.split()[0]): float(l.split()[1])
           for l in out.strip().splitlines()}
    for node, bc in GOLDEN_BC["test1"].items():
        assert got[node] == pytest.approx(bc, abs=1e-6)


def test_cli_decomposed_bc_parquet_sink(tmp_path):
    paths = [_write_edgelist(tmp_path, n) for n in ("test1", "test3")]
    out_dir = tmp_path / "scores"
    assert run([*paths, "--algo", "bc-decomposed",
                "-o", str(out_dir)]) == 0
    for name in ("test1", "test3"):
        files = sorted((out_dir / name).glob("part-*.parquet"))
        assert files and (out_dir / name / "manifest.json").exists()
        t = pq.read_table([str(f) for f in files])
        got = dict(zip(t.column("node").to_numpy(),
                       t.column("bc").to_numpy()))
        for node, bc in GOLDEN_BC[name].items():
            assert got[node] == pytest.approx(bc, abs=1e-6)


def test_cli_degrees_and_components(tmp_path, capsys):
    path = _write_edgelist(tmp_path, "test3")
    assert run([path, "--algo", "degrees"]) == 0
    out = capsys.readouterr().out
    got = {int(l.split()[0]): int(float(l.split()[1]))
           for l in out.strip().splitlines()}
    assert got == GOLDEN_DEGREES["test3"]

    path5 = _write_edgelist(tmp_path, "test5")
    assert run([path5, "--algo", "components"]) == 0
    out = capsys.readouterr().out
    comp = {int(l.split()[0]): int(float(l.split()[1]))
            for l in out.strip().splitlines()}
    labels = set(comp.values())
    assert len(labels) == 2  # test5 = test1 ⊎ shifted test3
    assert len({comp[v] for v in range(9)}) == 1
    assert len({comp[v] for v in range(9, 15)}) == 1


def test_cli_pagerank_sums_to_one(tmp_path, capsys):
    path = _write_edgelist(tmp_path, "test2")
    assert run([path, "--algo", "pagerank"]) == 0
    out = capsys.readouterr().out
    vals = np.array([float(l.split()[1])
                     for l in out.strip().splitlines()])
    assert vals.sum() == pytest.approx(1.0, abs=1e-6)
    assert len(vals) == 15
