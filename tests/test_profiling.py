

def test_t_closeness_hand_case_and_sql_twin(spark):
    """Group mirroring the global mix -> t = 0; group concentrated
    on one value -> t = 1 - N_s/N (the TV distance to the global);
    SQL twin bit-identical."""
    import duckdb

    from news_clustering_and_summarization_spark.operators.profiling import (
        t_closeness_audit,
        t_closeness_audit_sql,
    )

    # global: a:4, b:4  (N=8). g1 mirrors the mix (2a,2b -> t=0);
    # g2 is all-a: t = ½(|1 − ½| + |0 − ½|) = 0.5 (and symmetric g3)
    rows = (
        [("g1", "a")] * 2 + [("g1", "b")] * 2
        + [("g2", "a")] * 2
        + [("g3", "a")] * 0
        + [("g3", "b")] * 2
    )
    df = spark.createDataFrame(rows, "grp string, sv string")
    got = {
        r["grp"]: r
        for r in t_closeness_audit(df, ["grp"], "sv", t_q=200_000).collect()
    }
    assert got["g1"]["t_q_value"] == 0 and not got["g1"]["at_risk"]
    assert got["g2"]["t_q_value"] == 500_000 and got["g2"]["at_risk"]
    assert got["g3"]["t_q_value"] == 500_000
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, sv VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        con.execute(
            t_closeness_audit_sql("t", ["grp"], "sv", t_q=200_000)
        ).fetchall()
    )
    assert sorted(tuple(r) for r in got.values()) == want
