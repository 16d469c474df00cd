"""Driver-contract guards for bench.py's final stdout line.

Round 7's headline went unrecorded because the final JSON line outgrew
the driver's 2000-char tail buffer (BENCH_r07.json parsed: null) and
the next run then crashed on that null (VERDICT r7 task 1 / finding 1).
These tests pin both fixes without starting Spark.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def _phase_names():
    """Every phase key bench.py can emit into `queries` (statically
    scraped from the source so the test tracks additions)."""
    src = open(os.path.join(ROOT, "bench.py")).read()
    names = set()
    import re
    for m in re.finditer(r'timings\["([a-z0-9_]+)"\]', src):
        names.add(m.group(1))
    # the pipeline loop assigns timings[name] for each listed gate
    for m in re.finditer(r'"((?:doc|emb|geo|rel|evt|tmp)_[a-z0-9_]+)"',
                         src):
        names.add(m.group(1))
    return sorted(names)


def test_headline_line_fits_driver_tail_buffer():
    phases = _phase_names()
    assert len(phases) >= 20          # the scrape found the real list
    result = {
        "metric": "polygon_qps_at_le5pct_err",
        "value": 99999.99,
        "unit": "q/s",
        "queries": {p: 12345.678 for p in phases},
        "sf": "0.1",
        "detail": {"huge": "x" * 5000},   # must NOT appear in the line
    }
    out = bench.headline_line(result, "dist/bench_detail_last.json")
    assert len(out) < 1900, len(out)
    parsed = json.loads(out)
    assert parsed["metric"] == result["metric"]
    assert parsed["value"] == result["value"]
    assert parsed["unit"] == "q/s"
    assert parsed["sf"] == "0.1"
    assert parsed["queries"] == result["queries"]
    assert "detail" not in parsed


def test_prev_round_timings_survives_null_parsed():
    """BENCH_r07.json in the repo root has parsed: null; the lookup
    must skip it (falling back to an older round) instead of raising."""
    r = bench._prev_round_timings()
    if r is not None:
        tag, sf, queries = r
        assert tag.startswith("r")
        assert isinstance(queries, dict)
