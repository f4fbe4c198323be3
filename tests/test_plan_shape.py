"""Physical-plan regression guards: pushdown, pruning, broadcast, and
partial aggregation must survive future refactors (the 100 TB
properties, asserted mechanically)."""

import io
import contextlib

import pytest

from rustcheatersdatapipeline_spark.plans import queries as Q


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_projection_prunes_scan(spark, sf_dir):
    p = _plan(Q.q1(spark, sf_dir))
    assert "l_quantity" in p
    assert "l_extendedprice" not in p  # unneeded column never read


def test_filter_pushed_to_parquet(spark, sf_dir):
    p = _plan(Q.q4(spark, sf_dir))
    assert "StringContains(p_name,red)" in p  # PushedFilters reached the scan


def test_multiway_join_broadcasts_dims(spark, sf_dir):
    """The hinted (bounded) dim broadcasts at COMPILE time; the
    population-scaled customer side must NOT be compile-time-broadcast
    (static estimates lie downstream of explode/agg — the 100x gate
    crashed on exactly that), but AQE must promote it to broadcast at
    RUNTIME while it genuinely fits."""
    df = Q.q15(spark, sf_dir)
    p = _plan(df)
    assert "BroadcastHashJoin" in p  # nation hint honored statically
    df.collect()  # materialize THIS plan → AQE finalizes from true sizes
    s = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in s
    # toString() prints "== Final Plan ==" then "== Initial Plan ==";
    # the initial section legitimately contains the static SMJ
    final = s.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final  # customer promoted at runtime


def test_groupby_partial_aggregates(spark, sf_dir):
    p = _plan(Q.q22(spark, sf_dir))
    assert "partial_count" in p  # map-side combine before the exchange


def test_topk_plans_take_ordered(spark, sf_dir):
    p = _plan(Q.q23(spark, sf_dir))
    assert "TakeOrderedAndProject" in p  # top-k, not global sort


def test_jaccard_verify_has_no_forced_broadcast(spark, sf_dir):
    """The shingle-array table grows with the corpus: a broadcast HINT
    would force a driver OOM at scale. AQE must choose the strategy from
    runtime sizes (it still broadcasts at test scale — that's fine; the
    assertion is about the hint, not the chosen strategy)."""
    from rustcheatersdatapipeline_spark.plans import training as T

    df = T.dedup_minhash_lsh(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "Hint" not in analyzed


def test_fact_loads_hint_only_bounded_dims(spark):
    """Broadcast hints belong on catalog-sized dims only; player_dim
    grows with the user population and must be left to AQE."""
    from rustcheatersdatapipeline_spark.warehouse.loads import load_bans_fact
    from rustcheatersdatapipeline_spark.warehouse.writers import date_dim
    import datetime

    ply = spark.createDataFrame(
        [(1, "s1")], "player_sk int, steam_id string"
    )
    staged = spark.createDataFrame(
        [("s1", "2021-01-02 03:04:05", False, False, 0, 0, "none")],
        "steam_id string, last_ban_date string, community_banned boolean, "
        "vac_banned boolean, num_vac_bans int, num_game_bans int, economy_ban string",
    )
    dates = date_dim(spark, datetime.date(2021, 1, 1), datetime.date(2021, 1, 31))
    df = load_bans_fact(staged, {"player_dim": ply}, dates)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # exactly one hint: the bounded date dim; none for player_dim
    assert analyzed.count("ResolvedHint") == 1


def test_semdedup_hints_only_bounded_centroids(spark, sf_dir):
    """semdedup_prune may hint-broadcast ONLY the 16-centroid side; the
    cluster lists scale with the corpus and must be left to AQE."""
    from rustcheatersdatapipeline_spark.plans import training as T

    analyzed = T.semdedup_prune(spark, sf_dir)._jdf.queryExecution().analyzed().toString()
    # every hint in this plan wraps the vec_id < 16 centroid subtree
    assert analyzed.count("ResolvedHint") == analyzed.count(
        "ResolvedHint (strategy=broadcast)"
    )
    assert "vec_id#" in analyzed  # sanity: plan resolved


def test_dedup_cdc_plan_has_no_forced_broadcast(spark, sf_dir):
    """Both CDC join sides (chunk digests, digest stats) grow with the
    corpus — no broadcast hint anywhere; AQE decides at runtime."""
    from rustcheatersdatapipeline_spark.plans import training as T

    analyzed = T.dedup_cdc(spark, sf_dir)._jdf.queryExecution().analyzed().toString()
    assert "Hint" not in analyzed


def test_embed_neardup_has_no_driver_collect():
    """VERDICT r4 #2 regression guard: the all-pairs cosine baseline must
    build its block pairs distributively — a driver-side toPandas/collect
    of the corpus is a driver OOM at 100× data."""
    import ast
    import inspect
    import textwrap

    from rustcheatersdatapipeline_spark.plans import training as T

    tree = ast.parse(textwrap.dedent(inspect.getsource(T.embed_neardup_cosine)))
    fn = tree.body[0]
    if ast.get_docstring(fn) is not None:
        fn.body = fn.body[1:]  # drop the docstring node
    code = ast.unparse(tree)  # unparse also drops comments
    assert "toPandas" not in code
    assert ".collect(" not in code
    assert "sparkContext.broadcast" not in code


@pytest.mark.parametrize("qname", ["q2", "q3", "q18"])
def test_predicates_reach_scans(spark, sf_dir, qname):
    """Raw-column predicates must reach the parquet scan. (q5 is not in
    this list anymore: its null-drop is on a NULLIF-derived column, so
    the filter is inherently post-scan.)"""
    p = _plan(Q.SPARK_QUERIES[qname](spark, sf_dir))
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p


def test_pq_search_broadcasts_lut_never_cartesian(spark, sf_dir):
    """The ADC scan must be a broadcast-hash join of codes against the
    per-query lookup table — never a cartesian/nested-loop over the
    corpus — and the codebook side of the encode join must broadcast."""
    from rustcheatersdatapipeline_spark.plans import training as T

    p = _plan(T.ann_pq_search(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    p = _plan(T.ann_pq_rerank(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_pagerank_state_join_is_hash_not_nested_loop(spark):
    """One power-iteration round: the contribution join must hash, not
    nested-loop, and the plan must not grow a cartesian product."""
    from rustcheatersdatapipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    p = _plan(pagerank(edges, max_iter=2))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_weighted_sample_plans_take_ordered(spark, sf_dir):
    """The A-ES top-k must plan as TakeOrderedAndProject (bounded
    per-partition heaps + driver merge), never a global sort."""
    from rustcheatersdatapipeline_spark.plans import training as T

    p = _plan(T.weighted_sample_k(spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_dsir_topk_plans_take_ordered_and_no_cartesian_blowup(spark, sf_dir):
    """dsir_resample's selection must compile to TakeOrderedAndProject
    (never a global sort of the corpus), and the only cartesian in the
    weight plan is the 1-row totals grid."""
    from rustcheatersdatapipeline_spark.plans import training as T

    import re

    p = _plan(T.dsir_resample(spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    # the ONLY non-equi joins allowed are the totals grid: r_tot x t_tot
    # (1 row x 1 row) and scores x totals (buckets x 1 row). With static
    # auto-broadcast off (engine policy) they compile to CartesianProduct
    # over aggregated single-row inputs — harmless; anything beyond two
    # is a real blowup.
    cart = len(re.findall(r"\(\d+\) (?:CartesianProduct|BroadcastNestedLoopJoin)", p))
    assert cart <= 2


def test_dsir_grams_join_is_hash_on_bucket(spark, sf_dir):
    """The gram->score join must be an equi-join on bucket (hash or
    broadcast), never nested-loop: candidates stay linear in grams."""
    from rustcheatersdatapipeline_spark.plans import training as T

    p = _plan(T.dsir_logweights(spark, sf_dir))
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)


def test_video_neardup_is_banded_equijoin(spark):
    """The video pair join must key on (band, key[, rank]) — an
    equi-join — not a theta-join over all video pairs."""
    from rustcheatersdatapipeline_spark.functions.phash import video_neardup

    sigs = spark.createDataFrame(
        [(1, 0, 7), (1, 1, 9), (2, 0, 7), (2, 1, 9)],
        "item_id bigint, frame_rank int, phash bigint",
    )
    p = _plan(video_neardup(sigs))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_anchor_scan_is_single_pass_codegen(spark):
    """extract_anchors must not re-scan the pages per regex group: one
    scan row-explodes the zipped arrays (the Python boundary is only
    the urljoin resolver)."""
    from rustcheatersdatapipeline_spark.functions.weburl import extract_anchors

    pages = spark.createDataFrame(
        [("http://a.test/", '<a href="/x">y</a>')], "url string, html string"
    )
    import re

    p = _plan(extract_anchors(pages))
    # one scan of the in-memory relation, exploded once (count plan
    # NODES — explain('formatted') repeats names in the detail section)
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", p)) == 1
    assert "Generate" in p  # the explode


def test_temporal_joins_never_plan_cartesian(spark):
    """asof_join is a window over one group-key shuffle (no join node at
    all); interval_join must key the join on the group columns — never
    a cartesian/nested-loop over all pairs."""
    from rustcheatersdatapipeline_spark.operators.joins import asof_join, interval_join

    ldf = spark.createDataFrame([(0, 1.0, 1)], "g int, t double, lid int")
    rdf = spark.createDataFrame([(0, 1.0, "x")], "g int, t double, payload string")
    p = _plan(asof_join(ldf, rdf, "t", ["g"]))
    assert "Join" not in p  # union + window, not a join
    assert "Window" in p
    idf = spark.createDataFrame([(0, 1.0, 2.0, "x")], "g int, s double, e double, tag string")
    q = _plan(interval_join(ldf, idf, ["g"], "t", "s", "e"))
    assert "CartesianProduct" not in q and "BroadcastNestedLoopJoin" not in q


def test_mixture_sample_is_single_scan_one_window(spark, sf_dir):
    """mixture_token_budget_sample (r11 skew-safe form): the corpus is
    tokenized ONCE into a checkpointed narrow projection — the final
    plan reads the materialized RDD, never parquet — and the only join
    is the BROADCAST of the one-row-per-language admission threshold;
    the ranking window sorts only pre-filtered survivors."""
    from rustcheatersdatapipeline_spark.plans.training import (
        mixture_token_budget_sample,
    )

    import re

    p = _plan(mixture_token_budget_sample(spark, sf_dir))
    # count node HEADERS — explain("formatted") repeats names in details
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 0  # base is
    # materialized once; re-scanning text here would tokenize twice
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", p)) >= 1
    assert "CartesianProduct" not in p
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", p)
    assert joins and all("Broadcast" in j for j in joins), joins
    assert re.findall(r"\(\d+\) Window", p)


def test_hybrid_rrf_fuses_without_extra_corpus_scans(spark, sf_dir):
    """hybrid_search_rrf adds only a union + per-query aggregate over
    the two arms — no cartesian product, and the vector arm keeps its
    broadcast-query nested loop (bounded side) instead of a blowup."""
    from rustcheatersdatapipeline_spark.plans.retrieval import hybrid_search_rrf

    import re

    p = _plan(hybrid_search_rrf(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert re.findall(r"\(\d+\) Union", p)
    # exactly one broadcast nested loop with a BOUNDED broadcast side:
    # bm25's 1-row stats crossJoin — never corpus x corpus. The kNN
    # arm's former broadcast-query nested loop is a numpy block-dot
    # MapInPandas since r14 (_knn_topk)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) == 1
    assert re.findall(r"\(\d+\) MapInPandas", p)


@pytest.mark.parametrize(
    "name", ["dedup_ngram_jaccard", "dedup_spans", "dedup_substrings"]
)
def test_content_dedup_windows_are_doc_keyed_only(spark, sf_dir, name):
    """VERDICT r12 #4 pin: the r12 rewrites moved first-occurrence
    election (min(struct)) and document frequency (groupBy+join) off
    content-keyed windows — the one shuffle shape AQE cannot
    skew-split. Any window remaining in these plans must partition on
    doc_id (bounded per document by its own length), never on the
    shingle / gram / content-hash key a 30%-boilerplate corpus makes
    hot."""
    import re

    from rustcheatersdatapipeline_spark.plans import training as T

    fn = getattr(T, name, None) or T.TESTS_ONLY_QUERIES[name]
    plan = fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    # windowspecdefinition(<part1>#id, ... ) — the leading args up to
    # the first ASC/DESC/frame spec are the partition columns. The
    # bare-attribute regex must account for EVERY windowspecdefinition
    # in the plan: a window partitioned by an EXPRESSION over content
    # (e.g. pmod(xxhash64(g), N)) would not match and must fail the
    # count equality rather than pass vacuously (r13 review).
    total = plan.count("windowspecdefinition(")
    parts = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert len(parts) == total, (len(parts), total)
    assert all(c == "doc_id" for c in parts), parts
    assert "CartesianProduct" not in plan
