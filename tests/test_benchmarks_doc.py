"""BENCHMARKS.md must match regeneration from the recorded JSONs
(VERDICT r3 item 4: the perf doc cannot drift from the measurements)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_benchmarks_md_not_stale():
    import gen_benchmarks

    path = os.path.join(
        os.path.dirname(__file__), "..", "BENCHMARKS.md"
    )
    with open(path) as fh:
        assert fh.read() == gen_benchmarks.generate(), (
            "BENCHMARKS.md is stale; run python tools/gen_benchmarks.py"
        )
