"""Driver-contract simulation: run every queries() entry at sf0.01 and
compare against its oracle_sql() in DuckDB — row count, column names,
dtypes-compatible values, order-insensitive. This mirrors the external
gate (CORRECTNESS_r{N}.json) so mismatches surface before the round
closes."""

import pandas as pd
import pytest

import __spark_entry__ as entry_mod

from conftest import SF_ORACLE


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_index(axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    # unify integer dtypes (Spark int64 vs DuckDB int32/hugeint)
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]) or pdf[c].dtype == object and all(
                isinstance(v, int) for v in pdf[c].dropna()):
            try:
                pdf[c] = pdf[c].astype("int64")
            except (TypeError, OverflowError, ValueError):
                pass
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(9)
    return pdf


@pytest.fixture(scope="module")
def gate(spark):
    return entry_mod.queries(), entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == ["qid", "est"]


def test_all_queries_match_oracle(spark, duck, gate):
    qs, oracles = gate
    assert qs, "no gate queries registered"
    failures = []
    for name, fn in qs.items():
        sdf = fn(spark, SF_ORACLE)
        got = normalize(sdf.toPandas())
        if name not in oracles:
            assert len(got) >= 0  # rows-only check
            continue
        want = normalize(duck.execute(oracles[name]).df())
        if list(got.columns) != list(want.columns):
            failures.append(f"{name}: columns {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
        except AssertionError as e:
            failures.append(f"{name}: value mismatch:\n{e}")
    assert not failures, "\n".join(failures)


def test_gate_registry_staleness_rotation():
    """The registry is ordered by driver-verification staleness so the
    driver's 50-entry CORRECTNESS window rotates over all gates
    (VERDICT r3 item 1): never-verified names sort first, and the
    ordering is a permutation of the full registry (deterministic)."""
    import glob
    import json
    import os
    import re
    from spatialsketch_spark.gate import GATE_QUERIES, _staleness_order

    assert _staleness_order(dict(GATE_QUERIES)) == GATE_QUERIES  # stable
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name in json.load(open(path)):
            last[name] = max(last.get(name, -1), rnd)
    names = list(GATE_QUERIES)
    stamps = [last.get(n, -1) for n in names]
    assert stamps == sorted(stamps)          # ascending staleness order
    # never-driver-verified gates (if any) lead the window
    if -1 in stamps:
        assert stamps[0] == -1


# gates renamed after their last driver row; their rotation history is
# intentionally abandoned (the successor name re-enters as
# never-verified, which sorts FIRST — strictly safe). Any new rename
# must be added here consciously or the hygiene test fails.
RENAMED_GATES = {"emb_cosine_dups"}  # r1 name; r2+ = emb_lsh_dups


def test_no_stranded_rotation_history():
    """Registry hygiene (VERDICT r5 #9): every gate name that ever got
    a driver CORRECTNESS row must still be a live registry key (else a
    rename silently strands its rotation history and the staleness
    ordering runs on dead names), unless explicitly listed as a
    conscious rename above."""
    import glob
    import json
    import os
    from spatialsketch_spark.gate import GATE_QUERIES

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            seen |= set(json.load(fh))
    stranded = seen - set(GATE_QUERIES) - RENAMED_GATES
    assert not stranded, sorted(stranded)


def test_oracle_sql_builds_without_spark_session():
    """Every oracle generator must be a pure SQL-string producer: run
    the whole dict in a subprocess with NO SparkContext — one generator
    reaching for Spark Columns would take the entire oracle dict down
    (the failure mode the spherical gate had)."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, '.');"
         "import __spark_entry__ as e; print(len(e.oracle_sql()))"],
        capture_output=True, text=True, timeout=120,
        cwd=__import__("os").path.dirname(
            __import__("os").path.dirname(__import__("os").path.abspath(
                __file__))))
    assert out.returncode == 0, out.stderr
    assert int(out.stdout.strip()) >= 60


def test_fm_estimate_rounding_margin(spark):
    """ADVICE r4: the FM envelope oracle compares the ROUNDED estimate
    bit-for-bit across engines, which is safe only while the raw
    estimate keeps a clear margin from the .5 rounding boundary
    (python round is half-even, DuckDB ROUND half-away; libm pow
    agreement covers ulps, not boundary straddles). Assert the margin
    programmatically so a fixture or probe change that lands an
    estimate near a boundary fails HERE with a clear message instead
    of hash-mismatching in the driver gate. FM state over a region is
    insertion-order-free (OR of trailing-zero bitmaps), so the direct
    rebuild below equals the engine's merged cover-cell state."""
    import numpy as np
    from pyspark.sql import functions as F

    from spatialsketch_spark import gate_envelope as ge
    from spatialsketch_spark.core.kernels import FMKernel
    from spatialsketch_spark.geo.events import derive_geo_events

    cfg = ge._realistic_cfg()
    kern = FMKernel(max(cfg.eps, 0.25), cfg.delta, cfg.seed)
    ev = derive_geo_events(spark, SF_ORACLE, ge.N)
    for qid, ((x1, y1, x2, y2), _, _) in enumerate(ge.FM_PROBES):
        items = np.array(
            [r["item"] for r in ev.where(
                F.col("x").between(x1, x2)
                & F.col("y").between(y1, y2)).select("item").collect()],
            dtype=np.int64)
        zeros = np.zeros(len(items), dtype=np.int64)
        ones = np.ones(len(items), dtype=np.int64)
        _, states = kern.build_grouped(zeros, items, ones, zeros)
        raw = kern.estimate(states[0])
        dist = abs((raw - np.floor(raw)) - 0.5)
        assert dist >= 0.02, (
            f"FM probe {qid}: raw estimate {raw!r} sits {dist:.4f} from "
            f"the .5 rounding boundary — python half-even and DuckDB "
            f"half-away rounding could disagree there; adjust "
            f"gate_envelope.FM_PROBES or the fixture so the estimate "
            f"clears the boundary")
