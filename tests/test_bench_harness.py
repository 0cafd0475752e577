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
