"""Contract tests for the round-5 additions beyond the oracle gate:
KMV estimator accuracy + mergeability, interval-overlap bin-edge
completeness on crafted rows, and k-NN vote well-formedness.
"""

import pyspark.sql.functions as F

from feature_store_2_spark.queries import CATALOG

Q = {q.name: q.fn for q in CATALOG}


def test_kmv_estimate_within_sketch_error(spark, sf_dir):
    rows = Q["sketch_kmv_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.k_used < 32:
            # fewer distinct keys than k: KMV degenerates to exact
            assert r.est_ndv == float(r.k_used) == float(r.true_ndv)
        else:
            # KMV relative standard error is ~1/sqrt(k-2) (= 18% at
            # k=32); 4 sigma is a drift-catching but non-flaky bound
            assert abs(r.est_ndv - r.true_ndv) <= 4 * r.true_ndv / (30 ** 0.5)


def test_kmv_two_phase_equals_global_bottom_k(spark, sf_dir):
    # the salted two-phase bottom-k must select exactly the global
    # bottom-k hashes (mergeability is the whole point of the sketch)
    out = Q["sketch_kmv_distinct"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 14),
        16,
        10,
    ).cast("long")
    naive = (
        ev.select("event_type", h.alias("h"))
        .distinct()
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
        .select(
            "event_type",
            F.element_at(
                F.slice("hs", 1, 32), F.least(F.size("hs"), F.lit(32))
            ).alias("kth_naive"),
        )
    )
    joined = out.join(naive, "event_type").collect()
    assert joined and all(r.kth_h == r.kth_naive for r in joined)


def test_interval_overlap_bin_edges(spark, tmp_path):
    # crafted intervals around the 30-min bin boundary at t=1800s:
    # same-bin overlap, cross-bin overlap, exact touch, and a disjoint
    # pair — the binned join must return exactly the overlapping ones.
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, etype, sec):
        return (eid, base + dt.timedelta(seconds=sec), 1, etype, 1.0, "{}")

    rows = [
        ev(1, "purchase", 0),      # [0, 1800]
        ev(2, "click", 1800),      # [1800, 2400] — touches 1 at the bin edge
        ev(3, "purchase", 3000),   # [3000, 4800] — spans bins 1..2
        ev(4, "click", 3900),      # [3900, 4500] — inside 3, bin 2
        ev(5, "click", 7200),      # [7200, 7800] — disjoint from all
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)
    out = Q["join_interval_overlap_binned"](spark, str(tmp_path)).collect()
    pairs = {(r.purchase_id, r.click_id): r.overlap_us for r in out}
    assert pairs == {(1, 2): 0, (3, 4): 600_000_000}


def test_knn_vote_wellformed(spark, sf_dir):
    out = Q["emb_knn_label_vote"](spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert out.count() == emb.count()  # one verdict per vector
    labels = {r.label for r in emb.select("label").distinct().collect()}
    bad = out.filter(
        (~F.col("pred_label").isin(*labels))
        | (F.col("votes") < 1)
        | (F.col("votes") > 5)
        | (F.col("correct") != (F.col("pred_label") == F.col("true_label")))
    ).count()
    assert bad == 0


def test_pq_codes_contract(spark, sf_dir):
    out = Q["emb_pq_codes"](spark, sf_dir)
    bad = out.filter(
        (F.col("recon_dist2") < 0)
        | (F.col("code_0") < 0) | (F.col("code_0") > 15)
        | (F.col("code_1") < 0) | (F.col("code_1") > 15)
        | (F.col("code_2") < 0) | (F.col("code_2") > 15)
        | (F.col("code_3") < 0) | (F.col("code_3") > 15)
    ).count()
    assert bad == 0
    # codebook vectors encode themselves losslessly: code_s == vec_id,
    # recon_dist2 == 0
    selfenc = out.filter(F.col("vec_id") < 16).collect()
    assert len(selfenc) == 16
    for r in selfenc:
        assert (r.code_0, r.code_1, r.code_2, r.code_3) == (r.vec_id,) * 4
        assert r.recon_dist2 == 0


def test_asof_forward_gap_bounds(spark, sf_dir):
    out = Q["join_asof_forward_next_purchase"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_clicks = ev.filter(F.col("event_type") == "click").count()
    assert out.count() == n_clicks  # exactly one row per click (left semantics)
    bad = out.filter(
        (F.col("next_purchase_id").isNotNull() & (
            (F.col("gap_us") < 0) | (F.col("gap_us") > 3_600_000_000)))
        | (F.col("next_purchase_id").isNull() & F.col("gap_us").isNotNull())
    ).count()
    assert bad == 0


def test_ohlc_invariants(spark, sf_dir):
    out = Q["resample_weekly_ohlc"](spark, sf_dir)
    bad = out.filter(
        (F.col("low") > F.col("high"))
        | (F.col("open") > F.col("high")) | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high")) | (F.col("close") < F.col("low"))
        | (F.col("n_events") < 1)
    ).count()
    assert bad == 0


def test_skew_profile_contract(spark, sf_dir):
    rows = Q["stats_key_skew_profile"](spark, sf_dir).collect()
    assert len(rows) == 10
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(r.skew_factor > 0 and 0 < r.row_share < 1 for r in rows)


def test_canonical_keep_best_contract(spark, sf_dir):
    out = Q["dedup_canonical_keep_best"](spark, sf_dir)
    per_comp = out.groupBy("component").agg(
        F.sum(F.col("keep_best").cast("int")).alias("n_keep"),
        F.max("n_chars").alias("mx"),
        F.max(F.when(F.col("keep_best"), F.col("n_chars"))).alias("kept_chars"),
        F.count("*").alias("sz"),
        F.max("cluster_size").alias("sz_col"),
    )
    bad = per_comp.filter(
        (F.col("n_keep") != 1)
        | (F.col("kept_chars") != F.col("mx"))
        | (F.col("sz") != F.col("sz_col"))
    ).count()
    assert bad == 0


def test_pq_adc_topk_contract(spark, sf_dir):
    rows = Q["emb_pq_adc_topk"](spark, sf_dir).collect()
    assert len(rows) == 50  # 10 queries x top-5
    by_q = {}
    for r in rows:
        assert r.adc_dist2 >= 0 and r.vec_id != r.query_id
        by_q.setdefault(r.query_id, []).append((r.rank, r.adc_dist2))
    for q, rs in by_q.items():
        rs.sort()
        assert [r for r, _ in rs] == [1, 2, 3, 4, 5]
        dists = [d for _, d in rs]
        assert dists == sorted(dists)


def test_model_score_no_row_udf_and_keep_split(spark, sf_dir):
    out = Q["udf_model_score_linear"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # Arrow path, not row UDFs
    assert "MapInPandas" in plan
    kept = out.filter("keep").count()
    total = out.count()
    assert 0 < kept < total  # the threshold genuinely splits the corpus


def test_join_size_forecast_exact(spark, sf_dir):
    r = Q["stats_join_size_forecast"](spark, sf_dir).collect()[0]
    assert r.exact_match and r.forecast_rows == r.actual_rows
    assert r.max_key_rows <= r.forecast_rows


def test_scd2_ranges_tile_time(spark, sf_dir):
    out = Q["dim_scd2_from_events"](spark, sf_dir)
    # exactly one current version per user; ranges are half-open,
    # gap-free and overlap-free: next valid_from == this valid_to
    per_user = out.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur")
    )
    assert per_user.filter(F.col("n_cur") != 1).count() == 0
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("valid_from_us", "version_id")
    chk = out.withColumn("nxt_from", F.lead("valid_from_us").over(w))
    bad = chk.filter(
        (F.col("nxt_from").isNotNull() & (F.col("valid_to_us") != F.col("nxt_from")))
        | (F.col("nxt_from").isNull() & F.col("valid_to_us").isNotNull())
    ).count()
    assert bad == 0


def test_weighted_median_definition(spark, sf_dir):
    rows = Q["agg_weighted_median_quantity"](spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    import pandas as pd

    pdf = li.select("l_returnflag", "l_quantity", "l_extendedprice").toPandas()
    for r in rows:
        g = pdf[pdf.l_returnflag == r.l_returnflag].sort_values("l_quantity")
        wts = (g.l_extendedprice * 100).round().astype("int64")
        cum = wts.cumsum()
        med = g.l_quantity[cum * 2 >= wts.sum()].iloc[0]
        assert med == r.weighted_median_qty


def test_windowed_funnel_monotone_stages(spark, sf_dir):
    out = Q["funnel_windowed_conversion"](spark, sf_dir)
    win = 7 * 24 * 3600 * 1_000_000
    bad = out.filter(
        ((F.col("stage_reached") >= 2) & (
            F.col("click_us").isNull()
            | (F.col("click_us") <= F.col("signup_us"))
            | (F.col("click_us") > F.col("signup_us") + win)))
        | ((F.col("stage_reached") == 3) & (
            F.col("purchase_us").isNull()
            | (F.col("purchase_us") <= F.col("click_us"))
            | (F.col("purchase_us") > F.col("click_us") + win)))
        | ((F.col("stage_reached") == 1) & F.col("click_us").isNotNull())
    ).count()
    assert bad == 0


def test_ivf_cell_stats_complete(spark, sf_dir):
    rows = Q["emb_ivf_cell_stats"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert sum(r.n for r in rows) == emb.count()  # every vector in a cell
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    mean_imb = sum(r.imbalance for r in rows) / len(rows)
    assert abs(mean_imb - 1.0) < 1e-9  # imbalance normalized to mean 1


def test_xml_roundtrip_all_true(spark, sf_dir):
    out = Q["func_xml_events"](spark, sf_dir)
    assert out.filter(~F.col("roundtrip_ok")).count() == 0


def test_map_in_arrow_no_pandas_no_row_udf(spark, sf_dir):
    out = Q["udf_map_in_arrow_tokens"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan


def test_python_datasource_partitions_disjoint(spark, sf_dir):
    out = Q["scan_python_datasource"](spark, sf_dir)
    # the custom source's 4 hash partitions must reconstruct the exact
    # table: total row count equals the parquet source's
    total = out.agg(F.sum("n")).collect()[0][0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert total == ev.count()


def test_udtf_is_arrow_not_batch_eval(spark, sf_dir):
    out = Q["udtf_word_positions"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPythonUDTF" in plan
    assert "BatchEvalPython " not in plan


def test_tokenize_ids_roundtrip(spark, sf_dir):
    out = Q["doc_tokenize_to_ids"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert out.count() == docs.count()
    # id sequence length always equals the document's token count, and
    # decoding ids back through the vocab reproduces the original text
    sample = out.orderBy("doc_id").limit(20).collect()
    texts = {
        r.doc_id: r.text
        for r in docs.filter(F.col("doc_id") < 10_000).collect()
    }
    vocab_rows = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .collect()
    )
    terms = sorted(r.t for r in vocab_rows)
    id2term = {i + 1: t for i, t in enumerate(terms)}
    for r in sample:
        ids = [int(x) for x in r.token_ids.split(",")]
        assert len(ids) == r.n_tokens
        assert " ".join(id2term[i] for i in ids) == texts[r.doc_id]


def test_pagerank_mass_and_isolates(spark, sf_dir):
    out = Q["graph_pagerank_fixed_point"](spark, sf_dir).collect()
    n = len(out)
    base = (10**12 // n * 15) // 100
    for r in out:
        if r.degree == 0:
            # isolated docs converge to the damping base exactly
            assert r.pagerank_fp == base
        else:
            assert r.pagerank_fp >= base
    # total mass stays bounded by the scale (dangling mass only leaks)
    assert sum(r.pagerank_fp for r in out) <= 10**12


def test_twap_bounded_by_minmax(spark, sf_dir):
    out = Q["window_time_weighted_avg"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "purchase"
    )
    mm = ev.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bad = (
        out.join(mm, "user_id")
        .filter(
            (F.col("twap_micro") < F.floor(F.col("lo") * 1_000_000) - 1)
            | (F.col("twap_micro") > F.floor(F.col("hi") * 1_000_000) + 1)
        )
        .count()
    )
    assert bad == 0  # an integral mean stays inside the value envelope


def test_stream_python_datasource_multibatch(spark, sf_dir):
    # the custom streaming source must deliver ALL rows across its
    # offset-range micro-batches (2500-row chunks => >1 batch at sf0.01+)
    out = Q["stream_python_datasource"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert out.agg(F.sum("n")).collect()[0][0] == ev.count()


def test_jsonl_export_escaping_and_parse_roundtrip(spark, sf_dir):
    import json

    # crafted rows exercising the ESCAPED path the corpus never hits
    df = spark.createDataFrame(
        [(1, "en", 'he said "hi"'), (2, "de", "back\\slash"), (3, "fr", "tab\there")],
        "doc_id long, lang string, text string",
    )
    out = df.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "text")).alias("record"),
    ).collect()
    for r in out:
        parsed = json.loads(r.record)  # valid JSON even with escapes
        assert parsed["doc_id"] == r.doc_id
    # corpus export parses back losslessly
    recs = Q["doc_export_jsonl"](spark, sf_dir).limit(50).collect()
    for r in recs:
        assert json.loads(r.record)["doc_id"] == r.doc_id


def test_pagerank_base_floor_non_divisor_n(spark, tmp_path):
    # r5 review finding: with n not dividing 10**12 the oracle's float
    # division rounded differently from Spark's floored base. Pin the
    # floored arithmetic on a 3-doc corpus (1e12 % 3 != 0), no edges.
    import duckdb

    rows = [(i, f"uniquetext{i} x{i} y{i} z{i}", "en", "s", 20) for i in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    out = {r.doc_id: r.pagerank_fp for r in Q["graph_pagerank_fixed_point"](spark, str(tmp_path)).collect()}
    base = ((10**12 // 3) * 15) // 100
    assert out == {0: base, 1: base, 2: base}
    # and the DuckDB oracle agrees on the same files
    from feature_store_2_spark.queries import CATALOG

    oracle = next(q.oracle for q in CATALOG if q.name == "graph_pagerank_fixed_point")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    res = {r[0]: r[1] for r in con.execute(oracle).fetchall()}
    assert res == out


def test_curriculum_order_dense_and_staged(spark, sf_dir):
    out = Q["doc_curriculum_order"](spark, sf_dir)
    # order indices are dense 1..n per (stage, shard)
    dense = (
        out.groupBy("stage", "shard")
        .agg(F.max("order_in_shard").alias("mx"), F.count("*").alias("n"))
        .filter(F.col("mx") != F.col("n"))
        .count()
    )
    assert dense == 0
    # stages respect the length thresholds
    bad = out.filter(
        ((F.col("stage") == 0) & (F.col("n_tokens") >= 40))
        | ((F.col("stage") == 1) & ((F.col("n_tokens") < 40) | (F.col("n_tokens") >= 70)))
        | ((F.col("stage") == 2) & (F.col("n_tokens") < 70))
    ).count()
    assert bad == 0


def test_chi_squared_margins_positive(spark, sf_dir):
    r = Q["ab_test_chi_squared"](spark, sf_dir).collect()[0]
    for margin in (r.a + r.b, r.c + r.d, r.a + r.c, r.b + r.d):
        assert margin > 0  # no degenerate contingency margins
    assert r.chi2 >= 0


def test_gini_bounds(spark, sf_dir):
    rows = Q["agg_gini_spend"](spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.gini < 1
        assert r.gini_den > 0
        assert abs(r.gini - r.gini_num / r.gini_den) < 1e-12


def test_distribution_drift_accounting(spark, sf_dir):
    out = Q["dq_distribution_drift"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # every event lands in exactly one (type, bin, half) cell
    tot = out.agg(F.sum(F.col("o_early") + F.col("o_late"))).collect()[0][0]
    assert tot == ev.count()
    bad = out.filter(
        (F.col("drift_term") < 0)
        | ((F.col("o_early") == 0) & F.col("drift_term").isNotNull())
    ).count()
    assert bad == 0


def test_confusion_matrix_shares(spark, sf_dir):
    rows = Q["eval_lang_confusion"](spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n for r in rows) == docs_n
    from collections import defaultdict

    by_true = defaultdict(float)
    for r in rows:
        by_true[r.true_lang] += r.recall_share
        assert 0 < r.recall_share <= 1 and 0 < r.precision_share <= 1
        assert r.is_diag == (r.true_lang == r.pred_lang)
    for v in by_true.values():
        assert abs(v - 1.0) < 1e-9  # row shares sum to 1 per true class


def test_collation_merges_case_variants(spark, sf_dir):
    rows = Q["func_collation_case_insensitive"](spark, sf_dir).collect()
    assert rows and all(r.term == r.term.lower() for r in rows)
    variants = {r.n_case_variants for r in rows}
    assert variants <= {1, 2} and 2 in variants  # collation merged spellings
    # Since r9 the entry scopes itself to ASCII tokens IN-QUERY (the
    # collate==lower() equivalence only holds for simple case mapping;
    # the r9 unicode fixture fed it 'İstanbul'/'straße' and the old
    # corpus-precondition assert became an in-plan filter). Pin the
    # filter: every grouped term is ASCII on ANY corpus by
    # construction now.
    assert all(r.term.isascii() for r in rows)


def test_stream_python_datasource_restart_recovery(spark, sf_dir, tmp_path):
    # kill the stream after its first micro-batches, restart from the
    # SAME checkpoint: the offset contract (initialOffset/read/
    # readBetweenOffsets) must resume without loss or double-counting.
    from pyspark.sql import functions as F2
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    path = f"{sf_dir}/events.parquet"

    class _R(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self._path = options["path"]
            self._chunk = 2000

        def initialOffset(self):
            return {"pos": 0}

        def _table(self):
            import pyarrow.parquet as pq

            return pq.read_table(self._path, columns=["event_id", "user_id"]).sort_by(
                "event_id"
            )

        def _rows(self, t, lo, hi):
            c = t.slice(lo, hi - lo)
            return iter(
                list(zip(c.column("event_id").to_pylist(), c.column("user_id").to_pylist()))
            )

        def read(self, start):
            t = self._table()
            lo = start["pos"]
            hi = min(lo + self._chunk, t.num_rows)
            if lo >= hi:
                return iter([]), {"pos": lo}
            return self._rows(t, lo, hi), {"pos": hi}

        def readBetweenOffsets(self, start, end):
            return self._rows(self._table(), start["pos"], end["pos"])

    class _S(DataSource):
        @classmethod
        def name(cls):
            return "fs2_events_stream_py_recovery"

        def schema(self):
            return "event_id bigint, user_id bigint"

        def simpleStreamReader(self, schema):
            return _R(self.options)

    spark.dataSource.register(_S)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def start():
        return (
            spark.readStream.format("fs2_events_stream_py_recovery")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    # let at least one batch commit, then kill mid-stream
    import time

    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if any(p.numInputRows > 0 for p in q.recentProgress):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    # restart from the same checkpoint and drain fully
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()
    got = spark.read.parquet(out_dir)
    ev = spark.read.parquet(path)
    assert got.count() == ev.count()  # no loss, no double-count
    assert got.select(F2.sum("event_id")).collect()[0][0] == ev.select(
        F2.sum("event_id")
    ).collect()[0][0]
