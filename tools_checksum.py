"""Result-identity harness for the optimization round: order-insensitive
checksums (count + bit_xor of xxhash64 over every column) for every declared
query, so any plan rewrite is provably result-identical before/after.

Usage: python tools_checksum.py <sf_dir> <out.json> [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    only = set(sys.argv[3:])

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from spel_spark.session import get_spark

    spark = get_spark(app_name="checksums", shuffle_partitions=32)
    results: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        try:
            df = fn(spark, sf_dir)
            # deterministic column order; stringify doubles at full repr via
            # cast to string is LOCALE-free in Spark; hash the struct row
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64(F.to_json(F.struct(*df.columns)))).alias("h"),
            ).collect()[0]
            results[name] = {"n": row["n"], "h": row["h"], "cols": df.columns}
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:500]}
        print(name, results[name].get("n"), results[name].get("h"), flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
