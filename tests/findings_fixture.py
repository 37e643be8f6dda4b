"""Deterministic synthetic "findings" NDJSON fixture for parity tests.

Written from scratch to the shape documented in FIXTURES.md §A (the
reference ships a generator of OCSF-style incident findings with 4-level
nesting, heterogeneous sibling records, six ``_dt`` sites at depths 1-4,
and monotonically increasing ``time``; reference
generate/findings/main.py:19-249). This module reproduces the *shape* —
nesting depth, heterogeneity, ``_dt`` placement, sorted/shuffled pair —
not the reference's code.
"""

from __future__ import annotations

import gzip
import json
import random
from datetime import datetime, timedelta, timezone

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"


def make_record(i: int, rng: random.Random) -> dict:
    t = EPOCH + timedelta(seconds=i)
    related_events = [
        {
            "uid": f"evt-{i}-{j}",
            # heterogeneous: 'type' only on even elements
            **({"type": rng.choice(["alert", "scan"])} if j % 2 == 0 else {}),
            "severity_id": rng.randint(1, 5),
            "attacks": [
                {
                    # heterogeneous siblings: last element swaps version->semantic
                    **({"semantic": rng.randint(1, 9)} if k == 2 else {"version": "14.1"}),
                    "tactics": [{"name": f"tac{k}", "uid": f"TA{k:04d}"}],
                    "technique": (
                        {"name": "tech", "uid": f"T{k:04d}"}
                        if k % 2
                        else {"name": "tech", "one": "x", "two": "y"}
                    ),
                }
                for k in range(3)
            ],
            "created_time": int(t.timestamp() * 1000),
            "modified_time_dt": _iso(t + timedelta(minutes=j)),
        }
        for j in range(rng.randint(1, 3))
    ]
    info0 = {
        "title": f"finding {i}.0",
        "uid": f"f-{i}-0",
        "product_uid": f"p-{i}",
        "related_events": related_events,
        "related_events_count": len(related_events),
        "created_time_dt": _iso(t - timedelta(hours=1)),
    }
    info1 = {
        "title": f"finding {i}.1",
        "uid": f"f-{i}-1",
        "analytic": {"name": "an", "type": "rule", "type_id": 1},
        "related_events": [],
        "related_events_count": 0,
        "first_seen_time_dt": _iso(t - timedelta(days=1)),
    }
    return {
        "message": f"incident {i}",
        "severity": rng.choice(["Low", "Medium", "High"]),
        "time": int(t.timestamp() * 1000),
        "time_dt": _iso(t),
        "class_uid": 2005,
        "duration": rng.randint(0, 3600),
        "metadata": {
            "version": "1.1.0",
            "product": {
                "name": "synthetic",
                "vendor_name": "fixture",
                "uid": f"prod-{i % 7}",
                "my_dt": _iso(t + timedelta(seconds=30)),
            },
            "profiles": ["incident", "datetime"],
            "tenant_uid": f"tenant-{i % 3}",
        },
        "finding_info_list": [info0, info1],
    }


# All string *_dt sites in the fixture, as dotted paths (depths 1-4).
DT_PATHS = sorted(
    [
        "time_dt",
        "metadata.product.my_dt",
        "finding_info_list[].created_time_dt",
        "finding_info_list[].first_seen_time_dt",
        "finding_info_list[].related_events[].modified_time_dt",
    ]
)


def write_fixture(dirpath: str, n: int = 500, seed: int = 7) -> tuple[str, str]:
    """Write sorted + shuffled .ndjson.gz variants of the same records;
    returns (sorted_path, shuffled_path)."""
    rng = random.Random(seed)
    records = [make_record(i, rng) for i in range(n)]
    sorted_path = f"{dirpath}/finding-sorted.ndjson.gz"
    shuffled_path = f"{dirpath}/finding-unsorted.ndjson.gz"
    with gzip.open(sorted_path, "wt") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    shuffled = list(records)
    rng.shuffle(shuffled)
    with gzip.open(shuffled_path, "wt") as f:
        for r in shuffled:
            f.write(json.dumps(r) + "\n")
    return sorted_path, shuffled_path
