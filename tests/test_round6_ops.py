"""Contract tests for the round-6 additions beyond the oracle gate:
star-CC parity with the min-label entry, sweep monotonicity, triangle
well-formedness, MinHash estimate-error bounds, winnowing's shared-
substring guarantee on crafted docs, group-split leakage-freedom, BM25
ranking sanity, and cogrouped-as-of equivalence to the all-JVM plan.
"""

import pyspark.sql.functions as F

from feature_store_2_spark.queries import CATALOG

Q = {q.name: q.fn for q in CATALOG}


def test_star_cc_entry_matches_minlabel_entry(spark, sf_dir):
    # The two scored clustering entries run entirely different fixpoint
    # algorithms (O(diameter) min-label vs O(log n) large/small-star);
    # they must agree label-for-label on the same edge set.
    a = {
        r.doc_id: (r.component, r.keep)
        for r in Q["dedup_cluster_components"](spark, sf_dir).collect()
    }
    b = {
        r.doc_id: (r.component, r.keep)
        for r in Q["dedup_cluster_components_star"](spark, sf_dir).collect()
    }
    assert a == b and a


def test_threshold_sweep_monotone(spark, sf_dir):
    rows = sorted(
        Q["dedup_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.threshold_pct,
    )
    assert [r.threshold_pct for r in rows] == [50, 60, 70, 80, 90]
    pairs = [r.n_pairs for r in rows]
    docs = [r.n_docs_flagged for r in rows]
    # tightening the threshold can only shrink the flagged set
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    for r in rows:
        assert r.n_docs_flagged <= 2 * r.n_pairs
    # the 50% cut must equal the standalone exact-Jaccard entry
    n_50 = Q["dedup_ngram_jaccard"](spark, sf_dir).count()
    assert pairs[0] == n_50


def test_triangle_count_well_formed(spark, sf_dir):
    rows = Q["graph_triangle_count"](spark, sf_dir).collect()
    assert rows and all(r.n_triangles >= 0 for r in rows)
    # every triangle contributes exactly 3 node-incidences
    assert sum(r.n_triangles for r in rows) % 3 == 0
    # a node in a triangle has >= 2 near-dup edges
    edges = Q["dedup_ngram_jaccard"](spark, sf_dir).collect()
    deg: dict = {}
    for e in edges:
        deg[e.doc1] = deg.get(e.doc1, 0) + 1
        deg[e.doc2] = deg.get(e.doc2, 0) + 1
    for r in rows:
        if r.n_triangles > 0:
            assert deg.get(r.doc_id, 0) >= 2, r.doc_id


def test_minhash_estimate_quality_bounds(spark, sf_dir):
    rows = Q["dedup_minhash_estimate_quality"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_agree <= 16
        assert 1 <= r.n_shared_bands <= 4
        # >= 1 shared band forces >= 4 agreeing consecutive minhashes
        assert r.n_agree >= 4
        assert 0 <= r.est_jaccard_micro <= 1_000_000
        assert 0 <= r.true_jaccard_micro <= 1_000_000
        assert r.abs_err_micro == abs(
            r.est_jaccard_micro - r.true_jaccard_micro
        )


def test_token_cosine_pairs_in_unit_range(spark, sf_dir):
    rows = Q["sim_token_cosine_pairs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.dot_tf > 0
        # Cauchy-Schwarz; tiny fp headroom on the upper bound
        assert 0.0 < r.cos_tf <= 1.0 + 1e-12


def test_winnowing_shared_substring_guarantee(spark, tmp_path):
    # THE winnowing property (Schleimer et al.): any shared run of
    # >= k + w - 1 = 6 words forces a shared fingerprint. Crafted docs:
    # same 8-word core with different prefixes/suffixes.
    core = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {core} four five"),
            (2, f"nine eight {core} seven six ten eleven"),
            (3, "completely different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)
    out = Q["doc_winnowing_fingerprints"](spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2], "shared 8-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_group_split_has_zero_leakage(spark, sf_dir):
    rows = Q["doc_group_split_no_leakage"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert len(rows) == docs.count()
    split_of: dict = {}
    for r in rows:
        assert r.split in ("train", "val", "test")
        prev = split_of.setdefault(r.source, r.split)
        # the defining property: a source can never straddle splits
        assert prev == r.split, r.source


def test_bm25_ranking_sane(spark, sf_dir):
    rows = Q["search_bm25_topk"](spark, sf_dir).collect()
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r.term, []).append(r)
        assert r.score_scaled >= 0 and r.tf >= 1 and r.dl >= 1
    assert len(by_term) == 5
    for term, rs in by_term.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score_scaled for r in rs]
        assert scores == sorted(scores, reverse=True), term


def test_cogrouped_asof_matches_jvm_asof(spark, sf_dir):
    # The pandas-cogroup path and the all-JVM window/join as-of must
    # agree row-for-row (same oracle, two execution strategies).
    out = {
        (r.user_id, r.purchase_id): (r.signup_version, r.signup_attr)
        for r in Q["udf_cogrouped_asof_join"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("version_id"),
        F.col("ts").alias("sts"),
        F.col("value").alias("attr"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "purchase_id").orderBy(
        F.desc("sts"), F.desc("version_id")
    )
    jvm = (
        p.join(s, ["user_id"], "left")
        .filter(F.col("sts").isNull() | (F.col("sts") <= F.col("pts")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "purchase_id", "version_id", "attr")
    )
    jvm_map = {
        (r.user_id, r.purchase_id): (r.version_id, r.attr)
        for r in jvm.collect()
    }
    # purchases whose every signup is later drop from the filtered JVM
    # join; the cogroup emits them with nulls — align before comparing
    for k, v in out.items():
        assert jvm_map.get(k, (None, None)) == v
    assert len(out) == p.count()


def test_winnowing_containment_detects_crafted_inclusion(spark, tmp_path):
    # doc 2 contains doc 1's full 12-word text verbatim -> containment
    # of 1 in 2 must be ~1.0; the unrelated doc 3 must pair with no one.
    inner = "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu"
    docs = spark.createDataFrame(
        [
            (1, inner),
            (2, f"intro words here {inner} closing words after"),
            (3, "totally unrelated vocabulary set speaking other things"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = Q["dedup_winnowing_containment"](spark, str(tmp_path)).collect()
    pairs = {(r.doc1, r.doc2): r for r in rows}
    assert set(pairs) == {(1, 2)}
    r = pairs[(1, 2)]
    assert r.contain_1_in_2 >= 0.9  # nearly every fp of the short doc
    assert 0.0 < r.contain_2_in_1 <= 1.0


def test_clustering_coefficient_consistent_with_triangles(spark, sf_dir):
    cc = {r.doc_id: r for r in Q["graph_clustering_coefficient"](spark, sf_dir).collect()}
    tri = {
        r.doc_id: r.n_triangles
        for r in Q["graph_triangle_count"](spark, sf_dir).collect()
    }
    assert cc
    for doc_id, r in cc.items():
        assert r.degree >= 1
        assert 0 <= r.clustering_micro <= 1_000_000
        assert r.n_triangles == tri.get(doc_id, 0)
        if r.degree >= 2:
            expected = (2 * r.n_triangles * 1_000_000) // (
                r.degree * (r.degree - 1)
            )
            assert r.clustering_micro == expected
    # nodes absent from cc (isolated) must have zero triangles
    for doc_id, n in tri.items():
        if doc_id not in cc:
            assert n == 0


def test_kmv_set_ops_estimates_and_truth(spark, sf_dir):
    rows = Q["sketch_kmv_set_ops"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.t1 < r.t2
        assert 0 <= r.n_both <= r.k_used <= 32
        assert r.true_inter <= r.true_union
        assert r.est_inter <= r.est_union + 1e-9
        if r.k_used == 32:
            # KMV union RSE ~ 1/sqrt(k-2); 4 sigma, non-flaky
            assert abs(r.est_union - r.true_union) <= 4 * r.true_union / (30 ** 0.5)
            # intersection estimate: binomial sampling on top of union
            # error; loose but drift-catching bound
            assert abs(r.est_inter - r.true_inter) <= max(
                6 * r.true_union / (30 ** 0.5), 0.35 * r.true_union
            )
        else:
            assert r.est_union == float(r.k_used)


def test_asof_nearest_agrees_with_directional_entries(spark, sf_dir):
    near = {
        r.click_id: r
        for r in Q["join_asof_nearest_purchase"](spark, sf_dir).collect()
    }
    fwd = {
        r.click_id: r
        for r in Q["join_asof_forward_next_purchase"](spark, sf_dir).collect()
    }
    assert near and len(near) == len(fwd)
    for cid, r in near.items():
        if r.direction == "forward":
            # a forward winner must BE the forward entry's match
            assert fwd[cid].next_purchase_id == r.nearest_purchase_id
            assert fwd[cid].gap_us == r.signed_gap_us >= 0
        elif r.direction == "backward":
            assert r.signed_gap_us <= 0
            f = fwd[cid]
            # backward won: any forward match within tolerance can't be
            # strictly closer
            if f.next_purchase_id is not None:
                assert f.gap_us >= -r.signed_gap_us
        else:
            assert r.nearest_purchase_id is None and r.signed_gap_us is None
            assert fwd[cid].next_purchase_id is None


def test_ols_matches_numpy(spark, sf_dir):
    import numpy as np

    row = Q["stats_ols_user_spend"](spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from decimal import Decimal

    per = {}
    for r in ev.collect():
        x, y = per.get(r.user_id, (0, 0))
        if r.event_type == "click":
            x += 1
        elif r.event_type == "purchase":
            y += int(
                Decimal(str(r.value)).quantize(Decimal("0.000001"))
                * 1_000_000
            )
        per[r.user_id] = (x, y)
    xs = np.array([v[0] for v in per.values()], dtype=float)
    ys = np.array([v[1] for v in per.values()], dtype=float)
    assert row.n_users == len(per)
    r_np = np.corrcoef(xs, ys)[0, 1]
    slope_np = np.polyfit(xs, ys, 1)[0]
    assert abs(row.pearson_r - r_np) < 1e-9
    assert abs(row.slope_micro_per_click - slope_np) / abs(slope_np) < 1e-9


def test_referential_integrity_holds_on_tpch(spark, sf_dir):
    rows = {r.fk_name: r for r in Q["dq_referential_integrity"](spark, sf_dir).collect()}
    assert len(rows) == 4
    for name, r in rows.items():
        # TPC-H generators emit consistent FKs — all edges must hold
        assert r.fk_holds and r.n_orphans == 0, name
        assert r.match_ratio == 1.0
        assert r.n_child_rows > 0


def test_hll_exact_registers_error_bound(spark, sf_dir):
    rows = Q["sketch_hll_exact_registers"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_used <= 64
        assert r.n_zero_registers == 64 - r.n_used
        # raw HLL RSE ~ 1.04/sqrt(64) = 13%; allow 4 sigma, and skip
        # the bound in the small-range regime where the raw estimator
        # is biased by design (documented: no linear-counting branch)
        if r.n_zero_registers == 0:
            assert abs(r.est_raw - r.true_ndv) <= 4 * 0.13 * r.true_ndv
        assert r.est_raw > 0


def test_stream_cdc_tombstone_semantics(spark, tmp_path):
    # Crafted changelog: deletes must win by (ts, id) order — including
    # over a LATE-ARRIVING earlier upsert (no resurrection) — and a
    # post-delete upsert must recreate the key.
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, t(1), 1, "signup", 10.0, "{}"),
        (2, t(2), 1, "error", 0.0, "{}"),          # delete u1 -> gone
        (3, t(1), 2, "signup", 20.0, "{}"),
        (4, t(2), 2, "error", 0.0, "{}"),
        (5, t(3), 2, "signup", 22.0, "{}"),        # recreate u2
        (7, t(2), 3, "error", 0.0, "{}"),          # file-late upsert:
        (6, t(1), 3, "signup", 30.0, "{}"),        # ts-earlier, no resurrect
        (8, t(1), 4, "signup", 40.0, "{}"),        # plain insert
        (9, t(5), 4, "purchase", 99.0, "{}"),      # non-CDC type ignored
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.user_id: r
        for r in Q["stream_cdc_upsert_apply"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {2, 4}
    assert out[2].version_id == 5 and out[2].attr == 22.0
    assert out[4].version_id == 8 and out[4].attr == 40.0
