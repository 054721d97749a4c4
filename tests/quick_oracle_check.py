"""Ad-hoc oracle check for a subset of queries (dev loop, not pytest):
python tests/quick_oracle_check.py name1 name2 [sf_dir]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tests.test_oracle_parity import canon  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    sf_dir = next(
        (a for a in sys.argv[1:] if a.startswith("/")),
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
    )
    from sample_emr_on_eks_fgac_iceberg_spark.operators import ORACLE, QUERIES
    from sample_emr_on_eks_fgac_iceberg_spark.session import build_session
    from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import TABLE_NAMES

    spark = build_session(app_name="quick-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failed = []
    for name in names:
        try:
            got = QUERIES[name](spark, sf_dir).toPandas()
            exp = con.sql(ORACLE[name]).arrow().to_pandas(date_as_object=True)
            assert sorted(got.columns) == sorted(exp.columns), (
                f"cols {sorted(got.columns)} vs {sorted(exp.columns)}"
            )
            assert len(got) == len(exp), f"rows {len(got)} vs {len(exp)}"
            cg, ce = canon(got), canon(exp)
            if cg != ce:
                bad = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:2]
                raise AssertionError(
                    "values: " + "; ".join(f"spark={cg[i]} duck={ce[i]}" for i in bad)
                )
            print(f"OK   {name}: {len(got)} rows")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:500]}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
