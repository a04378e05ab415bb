"""merge_results.py semantics: keep-faster, --fresh eviction, race rows."""
import json
import subprocess
import sys


def _run(tmp_path, args, files):
    paths = []
    for i, rows in enumerate(files):
        p = tmp_path / f"in{i}.json"
        p.write_text(json.dumps(rows))
        paths.append(str(p))
    out = tmp_path / "out.json"
    subprocess.run(
        [sys.executable, "benchmarks/merge_results.py", *args, str(out),
         *paths],
        check=True, cwd="/root/repo", capture_output=True)
    return json.loads(out.read_text())


def _row(name, shape, ms, checked=True):
    return {"name": name, "shape": shape, "min_ms": ms, "checked": checked}


def test_fresh_evicts_from_middle_files(tmp_path):
    """Stale-shape rows of a --fresh group must be evicted from EVERY
    file before the group's last re-run, not just the first."""
    base = [_row("g/a", "stale-shape1", 1.0)]
    mid = [_row("g/a", "stale-shape2", 1.0)]
    last = [_row("g/a", "new-shape", 1.0)]
    merged = _run(tmp_path, ["--fresh", "g"], [base, mid, last])
    assert [r["shape"] for r in merged] == ["new-shape"]


def test_keep_faster_when_both_checked(tmp_path):
    merged = _run(tmp_path, [], [[_row("g/a", "s", 1.0)],
                                 [_row("g/a", "s", 2.0)]])
    assert merged[0]["min_ms"] == 1.0
    # later wins when the earlier row was unchecked (oracle fixes)
    merged = _run(tmp_path, [], [[_row("g/a", "s", 1.0, checked=None)],
                                 [_row("g/a", "s", 2.0)]])
    assert merged[0]["min_ms"] == 2.0


def test_dense_race_rows_keep_fastest_session(tmp_path):
    """Races carry no check but must keep their fastest session, or the
    sparse-vs-dense comparison mixes sessions in sparse's favor."""
    merged = _run(tmp_path, [], [
        [_row("g/dense-race", "s", 1.0, checked=None)],
        [_row("g/dense-race", "s", 2.0, checked=None)],
    ])
    assert merged[0]["min_ms"] == 1.0
