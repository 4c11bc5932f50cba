"""Contract tests for the round-8 late additions beyond the oracle
gate: exact Shapley attribution (pure-pandas recompute + the
efficiency axiom) and simplified silhouette (numpy recompute, bounds,
single-cluster NULL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from feature_store_2_spark.queries import CATALOG
from feature_store_2_spark.queries.timeseries import _SHAP_MAP
from feature_store_2_spark.sources.tables import load_table

_BY = {q.name: q for q in CATALOG}


@pytest.fixture(scope="module")
def events_pd(spark, sf_dir):
    return load_table(spark, "events", sf_dir).toPandas()


def _shapley_pandas(ev: pd.DataFrame) -> dict[str, dict[str, int]]:
    fp = (
        ev[ev["event_type"] == "purchase"]
        .groupby("user_id")["ts"]
        .min()
        .rename("pts")
    )
    bits = {"view": 1, "click": 2, "signup": 4}
    masks: dict[int, int] = {}
    convs: dict[int, int] = {}
    for uid, g in ev.groupby("user_id"):
        pts = fp.get(uid)
        conv = int(pts is not None and not pd.isna(pts))
        t = g[g["event_type"].isin(bits)]
        if conv:
            t = t[t["ts"] < pts]
        mask = 0
        for et in t["event_type"].unique():
            mask |= bits[et]
        masks[uid] = mask
        convs[uid] = conv
    seg: dict[int, list[int]] = {}
    for uid, m in masks.items():
        seg.setdefault(m, [0, 0])
        seg[m][0] += 1
        seg[m][1] += convs[uid]
    v = {m: (1_000_000 * c) // n for m, (n, c) in seg.items()}
    out: dict[str, dict[str, int]] = {}
    for ch, bit in bits.items():
        shap = sum(
            w * (v.get(s + b, 0) - v.get(s, 0))
            for (c2, b, s, w) in _SHAP_MAP
            if c2 == ch
        )
        n_exp = sum(n for m, (n, _) in seg.items() if m & bit)
        c_exp = sum(c for m, (_, c) in seg.items() if m & bit)
        out[ch] = {
            "shapley_x6_ppm": shap,
            "n_exposed": n_exp,
            "n_conv_exposed": c_exp,
            "v7_minus_v0_x6": 6 * (v.get(7, 0) - v.get(0, 0)),
        }
    return out


def test_shapley_matches_pandas_and_efficiency_axiom(spark, sf_dir, events_pd):
    out = (
        _BY["attribution_shapley"].fn(spark, sf_dir).toPandas()
        .set_index("channel")
    )
    ref = _shapley_pandas(events_pd)
    assert set(out.index) == set(ref)
    for ch, r in ref.items():
        assert int(out.loc[ch, "shapley_x6_ppm"]) == r["shapley_x6_ppm"]
        assert int(out.loc[ch, "n_exposed"]) == r["n_exposed"]
        assert int(out.loc[ch, "n_conv_exposed"]) == r["n_conv_exposed"]
    # efficiency axiom: credits telescope to v(full) - v(empty) (x6,
    # with unobserved coalitions contributing v=0 as documented)
    assert (
        int(out["shapley_x6_ppm"].sum())
        == ref["view"]["v7_minus_v0_x6"]
    )


def test_silhouette_matches_numpy_recompute(spark, sf_dir):
    from feature_store_2_spark.functions.vector import QUANT_SCALE

    out = (
        _BY["eval_silhouette_simplified"].fn(spark, sf_dir).toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    q = np.floor(
        np.stack(emb["embedding"].to_numpy()) * float(QUANT_SCALE)
    ).astype(np.int64)
    labels = emb["label"].to_numpy()
    cents = {}
    for lab in np.unique(labels):
        g = q[labels == lab]
        cents[lab] = np.floor(
            g.sum(axis=0).astype(float) / len(g)
        ).astype(np.int64)
    rows = []
    for vid, lab, vec in zip(emb["vec_id"], labels, q):
        d2 = {
            cl: int(((vec - c) ** 2).sum()) for cl, c in cents.items()
        }
        a2 = d2[lab]
        others = [d for cl, d in d2.items() if cl != lab]
        b2 = min(others) if others else None
        if b2 is None:
            s = None
        elif a2 == 0 and b2 == 0:
            s = 0.0
        else:
            sa, sb = np.sqrt(float(a2)), np.sqrt(float(b2))
            s = (sb - sa) / (sa if a2 >= b2 else sb)
        rows.append((vid, a2, b2, s))
    ref = pd.DataFrame(
        rows, columns=["vec_id", "a2", "b2", "s"]
    ).sort_values("vec_id").reset_index(drop=True)
    assert (out["dist2_own"].to_numpy() == ref["a2"].to_numpy()).all()
    assert (out["dist2_other"].to_numpy() == ref["b2"].to_numpy()).all()
    # bit-identical doubles: both sides are the same fixed IEEE chain
    assert (
        out["silhouette"].to_numpy() == ref["s"].astype(float).to_numpy()
    ).all()
    assert out["silhouette"].between(-1.0, 1.0).all()


def test_silhouette_single_cluster_is_null(spark, tmp_path):
    emb = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "label": [0, 0, 0],
            "embedding": [
                [0.1] * 64,
                [0.2] * 64,
                [0.3] * 64,
            ],
        }
    )
    emb.to_parquet(tmp_path / "embeddings.parquet")
    out = (
        _BY["eval_silhouette_simplified"]
        .fn(spark, str(tmp_path))
        .toPandas()
    )
    assert len(out) == 3
    # k=1: no other centroid exists; silhouette is undefined -> NULL
    assert out["dist2_other"].isna().all()
    assert out["silhouette"].isna().all()


def test_conformal_matches_pandas_and_coverage_band(spark, sf_dir, events_pd):
    import hashlib
    from decimal import Decimal, ROUND_HALF_UP

    out = _BY["eval_conformal_interval"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    row = out[0]

    def micro(x):
        return int(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            * 1_000_000
        )

    df = events_pd.assign(
        v=events_pd["value"].map(micro),
        par=events_pd["event_id"].map(
            lambda e: int(hashlib.md5(str(int(e)).encode()).hexdigest()[0], 16)
            % 2
        ),
    )
    cal = df[df["par"] == 0]
    tst = df[df["par"] == 1]
    mu = {
        t: int(g["v"].sum()) // len(g)
        for t, g in cal.groupby("event_type")
    }
    gm = int(cal["v"].sum()) // len(cal)
    res = sorted(
        abs(int(r["v"]) - mu[r["event_type"]]) for _, r in cal.iterrows()
    )
    n_cal = len(res)
    k = min((9 * (n_cal + 1) + 9) // 10, n_cal)
    q_hat = res[k - 1]
    n_cov = sum(
        abs(int(r["v"]) - mu.get(r["event_type"], gm)) <= q_hat
        for _, r in tst.iterrows()
    )
    assert row["n_cal"] == n_cal
    assert row["n_test"] == len(tst)
    assert row["q_hat_micro"] == q_hat
    assert row["n_covered"] == n_cov
    assert row["coverage_ppm"] == (1_000_000 * n_cov) // len(tst)
    # finite-sample conformal guarantee: coverage >= 1 - alpha holds
    # marginally; one split concentrates near 0.9 at these n — pin a
    # tolerant band that still catches a broken quantile pick
    assert 850_000 <= row["coverage_ppm"] <= 1_000_000


def test_modularity_matches_pure_python(spark, sf_dir):
    """Rebuild the symmetrized kNN edge set (same operator the entry
    uses — its cross-engine identity is pinned by the oracle), then
    recompute per-label modularity numerators in pure python and check
    the integer identities + the [-1/2, 1] bound on total Q."""
    from feature_store_2_spark.operators.dedup import (
        embedding_srp_knn_join_scored,
    )

    vecs = load_table(spark, "embeddings", sf_dir)
    knn = embedding_srp_knn_join_scored(vecs, k=5).select(
        "query_id", "neighbor_id"
    ).collect()
    labels = dict(
        vecs.select("vec_id", "label").rdd.map(tuple).collect()
    )
    edges = set()
    for r in knn:
        a, b = int(r["query_id"]), int(r["neighbor_id"])
        edges.add((a, b))
        edges.add((b, a))
    m = len(edges) // 2
    deg: dict[int, int] = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    deg_c: dict[int, int] = {}
    n_nodes: dict[int, int] = {}
    for v, d in deg.items():
        lab = int(labels[v])
        deg_c[lab] = deg_c.get(lab, 0) + d
        n_nodes[lab] = n_nodes.get(lab, 0) + 1
    e_in: dict[int, int] = {}
    for a, b in edges:
        la, lb = int(labels[a]), int(labels[b])
        if la == lb:
            e_in[la] = e_in.get(la, 0) + 1
    e_in = {k: v // 2 for k, v in e_in.items()}

    out = (
        _BY["graph_modularity_labels"].fn(spark, sf_dir).toPandas()
        .set_index("label")
    )
    assert set(out.index) == set(deg_c)
    total_q = 0.0
    for lab in deg_c:
        row = out.loc[lab]
        assert int(row["n_nodes"]) == n_nodes[lab]
        assert int(row["deg_c"]) == deg_c[lab]
        assert int(row["e_in"]) == e_in.get(lab, 0)
        assert int(row["m_edges"]) == m
        expect = 4 * m * e_in.get(lab, 0) - deg_c[lab] ** 2
        assert int(row["q_num_x4m2"]) == expect
        total_q += row["q_contribution"]
    # Newman bound: Q in [-1/2, 1]
    assert -0.5 - 1e-12 <= total_q <= 1.0 + 1e-12
    # handshake identity: community degrees sum to 2m
    assert sum(deg_c.values()) == 2 * m
