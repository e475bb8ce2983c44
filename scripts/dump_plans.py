"""Dump .explain('formatted') for catalog entries to plans/<dir>/.

Usage: python scripts/dump_plans.py <outdir> <suffix> <entry> [entry ...]

Writes plans/<outdir>/<entry>_<suffix>.txt for each entry. Used by the
optimization rounds to commit before/after physical plans.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", outdir)
    os.makedirs(dest, exist_ok=True)

    from etl_mark1_spark import get_spark
    from etl_mark1_spark.catalog import QUERIES

    spark = get_spark(app_name="dump-plans")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record the failure
            text = f"ERROR building {name}: {exc}\n"
        path = os.path.join(dest, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
