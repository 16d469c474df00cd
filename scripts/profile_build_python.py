"""Profile the pure-Python side of the sketch build (guide §1: measure
first). The mapInPandas functions in geo/build.py are plain Python —
profile them outside Spark on a realistic per-partition slice to see
where per-task CPU goes (kernel.build_grouped vs the per-cell
serialize loop vs the merge stage's per-row dict fold).

Usage: python scripts/profile_build_python.py [rows] [--cprofile]
"""

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from spatialsketch_spark.config import SketchConfig
from spatialsketch_spark.geo.build import (_merge_partitions,
                                           _partial_builder)

N = 4096
MIN_LEVEL = 4
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000


def synth(rows: int, seed: int = 1) -> pd.DataFrame:
    """Roughly one zorder-partitioned task's slice: x/y confined to a
    contiguous Z block (locality like the real build), uniform items."""
    rng = np.random.default_rng(seed)
    # one 1/32nd Z-range of the grid: x in [0, 4096), y in one band
    x = rng.integers(0, N, rows, dtype=np.int64)
    y = rng.integers(0, N // 32, rows, dtype=np.int64)
    return pd.DataFrame({
        "ts": np.arange(rows, dtype=np.int64),
        "item": rng.integers(0, 256, rows, dtype=np.int64),
        "x": x, "y": y,
        "value": np.ones(rows, dtype=np.int64),
    })


def run_partial(cfg, kind, pdf):
    fn = _partial_builder(cfg, kind, MIN_LEVEL)
    out = list(fn(iter([pdf])))
    return out[0]


def run_merge(cfg, kind, partial_df):
    fn = _merge_partitions(cfg, kind)
    out = list(fn(iter([partial_df])))
    return out[0]


def main():
    cfg = SketchConfig.realistic(n=N, eps=0.1, delta=0.05,
                                 item_domain=256)
    pdf = synth(ROWS)
    for kind in ("cm",):
        t0 = time.time()
        part = run_partial(cfg, kind, pdf)
        t1 = time.time()
        merged = run_merge(cfg, kind, part)
        t2 = time.time()
        print(f"{kind}: rows={ROWS} partial={t1-t0:.3f}s "
              f"cells={len(part)} merge={t2-t1:.3f}s "
              f"({ROWS/(t1-t0):,.0f} rows/s partial)")
        if "--cprofile" in sys.argv:
            for label, f in (("partial", lambda: run_partial(cfg, kind, pdf)),
                             ("merge", lambda: run_merge(cfg, kind, part))):
                pr = cProfile.Profile()
                pr.enable(); f(); pr.disable()
                s = io.StringIO()
                pstats.Stats(pr, stream=s).sort_stats("cumulative") \
                    .print_stats(18)
                print(f"--- {kind} {label} ---")
                print("\n".join(s.getvalue().splitlines()[4:28]))
        assert merged is not None


if __name__ == "__main__":
    main()
