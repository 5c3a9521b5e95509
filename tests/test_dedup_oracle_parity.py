"""Oracle parity for the dedup gates the round-4 registry
consolidation removed from the driver's 50-slot record
(minhash_signatures folded into dedup_minhash_lsh, simhash into
simhash_near_pairs — each is fully derived inside the surviving
gate's oracle SQL, but the standalone exact DuckDB cross-checks stay
alive here at sf0.001 cost)."""
from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", ["minhash_signatures", "simhash"])
def test_dedup_oracle_parity(spark, name):
    from gorilla_tsc_spark.operators import dedup
    from gorilla_tsc_spark.queries import _docs
    from tools.check_oracle import table_hash

    docs = _docs(spark, SF)
    if name == "minhash_signatures":
        sdf = dedup.minhash_signatures(docs)
        sql = dedup.minhash_signatures_sql()
    else:
        sdf = dedup.simhash(docs)
        sql = dedup.simhash_sql()

    con = duckdb.connect()
    con.sql("CREATE OR REPLACE VIEW documents AS "
            f"SELECT * FROM '{SF}/documents.parquet'")
    res = con.execute(sql)
    h_duck = table_hash([d[0] for d in res.description], res.fetchall())
    h_spark = table_hash(sdf.columns, [tuple(r) for r in sdf.collect()])
    assert h_spark == h_duck
