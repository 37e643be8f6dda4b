"""The bench rollup line (VERDICT r12 ask #1): the LAST stdout line must
parse inside the driver's ~2 KB tail capture no matter how large the
registry grows, keep the driver's metric/value/unit/queries/sf contract
shape, and surface movers vs the committed medians."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import rollup_line  # noqa: E402


def _fake(n):
    return {f"x{i:03d}_entry_with_a_long_descriptive_name": 0.5 + i * 0.013 for i in range(n)}


def test_rollup_under_2kb_at_300_entries():
    timings = _fake(300)
    medians = dict(timings)
    prev = {k: v * (1.0 + (i % 7 - 3) * 0.1) for i, (k, v) in enumerate(timings.items())}
    doc = rollup_line(timings, medians, prev, {"x172_drain"}, 123.456, 0.1, 3)
    line = json.dumps(doc)
    assert len(line.encode()) < 1800, f"rollup line {len(line)}B — must stay under the ~2KB tail window"
    parsed = json.loads(line)
    # driver contract shape
    assert parsed["metric"] == "headline_queries_total_wall_clock"
    assert parsed["value"] == 123.456
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert isinstance(parsed["queries"], dict) and len(parsed["queries"]) == 20


def test_rollup_top_entries_are_heaviest_and_decomp_excluded():
    timings = {"a": 1.0, "b": 9.0, "c": 3.0, "d": 7.0, "e": 2.0, "f": 8.0, "x172_drain": 99.0}
    # pad with 20 light entries so the cut is exercised at the new width
    timings.update({f"pad{i:02d}": 0.1 + i * 0.001 for i in range(20)})
    doc = rollup_line(timings, timings, {}, {"x172_drain"}, 30.0, 0.01, 3)
    assert len(doc["queries"]) == 20
    # the decomp row is excluded and the heaviest lead in order
    assert list(doc["queries"])[:6] == ["b", "f", "d", "c", "e", "a"]
    assert doc["entries"] == 26  # decomp rows don't count


def test_rollup_movers_threshold_and_cap():
    timings = {f"q{i}": 1.0 for i in range(10)}
    medians = dict(timings)
    prev = dict(timings)
    prev["q0"] = 0.5   # 2.0x — mover
    prev["q1"] = 2.0   # 0.5x — mover
    prev["q2"] = 0.9   # 1.11x — inside band, not a mover
    for i in range(3, 10):
        prev[f"q{i}"] = 1.0 / (1.2 + i * 0.01)  # all >1.15x movers
    doc = rollup_line(timings, medians, prev, set(), 10.0, 0.01, 3)
    movers = doc["movers_vs_committed_medians"]
    assert "q2" not in movers
    assert len(movers) == 5  # capped
    assert movers.get("q0") == 2.0 or "q0" in movers


def test_rollup_no_prev_medians_is_empty_movers():
    timings = {"a": 1.0}
    doc = rollup_line(timings, timings, {}, set(), 1.0, 0.001, 3)
    assert doc["movers_vs_committed_medians"] == {}
