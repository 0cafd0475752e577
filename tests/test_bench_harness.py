"""bench.py artifact hygiene: exception labels from child stderr are
canonicalized (digit runs -> N) and folded to {label: count} with a
hard cap on distinct entries, so the benign Spark accumulator-GC race
(22 instance-numbered repeats in round 9) can never flood the
artifact's tail window and push the timings out of the driver's view
(VERDICT r9 "What's wrong" item 1)."""

from __future__ import annotations

import importlib.util
import json
import pathlib

_BENCH = pathlib.Path(__file__).resolve().parent.parent / "bench.py"


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scan_canonicalizes_instance_numbers():
    b = _load_bench()
    text = "\n".join(
        f"23/07/01 ERROR TaskSchedulerImpl: Exception in task: attempted "
        f"to access non-existent accumulator {n}\n23/07/01 INFO ok"
        for n in (91234, 91235, 99999)
    )
    labels = b._scan_stderr(text)
    assert len(labels) == 3
    assert len(set(labels)) == 1  # digits canonicalized away
    assert "accumulator N" in labels[0]


def test_fold_caps_distinct_labels_and_counts():
    b = _load_bench()
    labels = ["heavy: accumulator N race"] * 22 + [
        f"g{i}: Distinct{i}Exception only once" for i in range(12)
    ]
    folded = b._fold_stderr_labels(labels)
    assert folded["heavy: accumulator N race"] == 22
    # capped: at most CAP + 1 (the overflow bucket) entries
    assert len(folded) <= b._STDERR_LABEL_CAP + 1
    overflow = [k for k in folded if k.startswith("...")]
    assert len(overflow) == 1
    assert sum(folded.values()) == len(labels)
    # the folded dict stays SMALL when serialized — the artifact tail
    # (last ~2000 chars) must keep room for the timings
    assert len(json.dumps(folded)) < 1200


def test_fold_empty_means_clean_run():
    b = _load_bench()
    assert b._fold_stderr_labels([]) == {}


def test_emit_last_line_is_compact_and_parseable(capsys, tmp_path, monkeypatch):
    """VERDICT r10 item 1: the driver reads only the LAST ~2,000 chars
    of stdout, so the orchestrator's FINAL line must be a complete,
    compact JSON object with metric/value/queries — the full record
    rides line 1 and the side file. A child emission stays one line."""
    b = _load_bench()
    side = tmp_path / "full.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", str(side))
    times = {f"q{i}_some_entry_name": round(1.0 + i / 7, 4) for i in range(36)}
    times["cdc_replay_msgs_per_sec"] = 221234.5
    spread = {k: [v, v * 1.3, 3] for k, v in times.items()}
    extra = {
        "bench_mode": "fresh-jvm-groups",
        "box_probe_s": {"before": 0.51, "after": 0.49},
        "box_probe_by_group_s": {g: 0.5 for g in "abcdef"},
        "stderr_exceptions": {},
        "box_slow_groups": ["a", "b"],
    }
    b._emit(times, 0.1, spread=spread, extra=extra)
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    full = json.loads(lines[0])
    assert "spread" in full and "box_probe_by_group_s" in full
    # the driver's view: ONLY the tail window survives
    tail = "\n".join(lines)[-2000:]
    last = tail.splitlines()[-1]
    assert len(last) <= 1900
    compact = json.loads(last)
    assert compact["metric"] == "headline_queries_total_wall"
    assert compact["queries"] == full["queries"]
    assert compact["value"] == full["value"]
    assert "spread" not in compact
    # child protocol: exactly one line, spread included
    b._emit(times, 0.1, spread=spread, extra=None)
    child_lines = capsys.readouterr().out.strip().splitlines()
    assert len(child_lines) == 1 and "spread" in json.loads(child_lines[0])


def test_traceback_blocks_yield_one_label():
    b = _load_bench()
    text = (
        "java.lang.IllegalStateException: boom 42\n"
        "\tat org.apache.spark.Foo.bar(Foo.scala:17)\n"
        "\tat org.apache.spark.Baz.qux(Baz.scala:99)\n"
        "ok line\n"
    )
    labels = b._scan_stderr(text)
    assert labels == ["java.lang.IllegalStateException: boom N"]
