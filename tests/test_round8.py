"""Semantic invariants for the round-8 additions (value parity is
covered by test_oracle_parity; these pin what an oracle hash can't
express — formula identities against independent Python recomputation,
monotonicity, and cross-branch consistency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_learning_practise_spark.datasets import load
from flink_learning_practise_spark.registry import all_queries


class TestHybridRrf:
    def test_fusion_matches_python_recombination(self, spark, sf_medium):
        """RRF scores must equal 1/(K+r) recombined in Python from the
        two branch rankings, and the fused list must draw from both."""
        from flink_learning_practise_spark.plans import llm_pipeline as llm

        emb = load(spark, sf_medium, "embeddings")
        sparse = [
            r.doc_id
            for r in llm.bm25_search(spark, sf_medium)
            .orderBy(F.desc("bm25"), "doc_id")
            .collect()
        ]
        from flink_learning_practise_spark.operators import similarity

        dense = [
            r.neighbor_id
            for r in similarity.knn_bruteforce(
                emb,
                emb.filter(F.col("vec_id") == llm.RRF_QUERY_VEC_ID),
                k=llm.RRF_TOP_N,
            )
            .orderBy("rank")
            .collect()
        ]
        expect = {}
        for i, d in enumerate(sparse, 1):
            expect[d] = expect.get(d, 0.0) + 1.0 / (llm.RRF_K + i)
        for i, d in enumerate(dense, 1):
            expect[d] = expect.get(d, 0.0) + 1.0 / (llm.RRF_K + i)
        got = llm.hybrid_rrf(spark, sf_medium).collect()
        assert len(got) == llm.RRF_TOP_N
        for r in got:
            assert abs(r.rrf_score - expect[r.doc_id]) < 1e-8
        # fused head == best python-side score
        top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
        assert got[0].doc_id == top[0][0]
        # both branches contribute somewhere in the fused list
        assert any(r.sparse_rank is not None for r in got)
        assert any(r.dense_rank is not None for r in got)


class TestHardNegatives:
    def test_labels_differ_and_ranks_monotone(self, spark, sf_medium):
        from flink_learning_practise_spark.plans import llm_pipeline as llm

        rows = llm.hard_negatives(spark, sf_medium).collect()
        assert rows
        by_q: dict[int, list] = {}
        for r in rows:
            assert r.negative_label != r.query_label
            by_q.setdefault(r.query_id, []).append(r)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            cosines = [r.cosine for r in rs]
            assert cosines == sorted(cosines, reverse=True)

    def test_top_negative_is_true_cross_label_max(self, spark, sf_medium):
        """The rank-1 negative must beat every other cross-label
        candidate — recomputed in numpy from the raw embeddings."""
        import numpy as np

        from flink_learning_practise_spark.plans import llm_pipeline as llm

        emb = {
            r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label)
            for r in load(spark, sf_medium, "embeddings").collect()
        }
        top1 = {
            r.query_id: (r.negative_id, r.cosine)
            for r in llm.hard_negatives(spark, sf_medium).collect()
            if r.rank == 1
        }
        for qid, (nid, cos) in top1.items():
            qv, ql = emb[qid]
            best = max(
                float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
                for vid, (v, lbl) in emb.items()
                if lbl != ql
            )
            assert abs(round(best, 6) - cos) <= 1e-6


class TestThresholdSweep:
    def test_monotone_and_anchored_to_tier(self, spark, sf_medium):
        from flink_learning_practise_spark.plans import llm_pipeline as llm

        rows = sorted(
            llm.dedup_threshold_sweep(spark, sf_medium).collect(),
            key=lambda r: r.threshold,
        )
        assert [r.threshold for r in rows] == list(llm.SWEEP_THRESHOLDS)
        pairs = [r.n_pairs for r in rows]
        losers = [r.n_losers for r in rows]
        assert pairs == sorted(pairs, reverse=True)
        assert losers == sorted(losers, reverse=True)
        tier = llm._shared_pair_tier(spark, sf_medium)
        assert rows[0].n_pairs == tier.count()
        n_docs = load(spark, sf_medium, "documents").count()
        for r in rows:
            assert r.n_survivors == n_docs - r.n_losers
            assert r.n_losers <= r.n_pairs or r.n_pairs == 0


class TestSpearmanDaily:
    def test_matches_pure_python_spearman(self, spark, sf_medium):
        """Independent recomputation: average-rank Spearman in plain
        Python over the same daily aggregate — catches any formula
        error a DuckDB replay of the same SQL would share."""
        import math

        from flink_learning_practise_spark.plans import order_stats as os_

        daily = (
            load(spark, sf_medium, "orders")
            .groupBy(F.to_date("o_orderdate").alias("d"))
            .agg(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                        "decimal(38,0)"
                    )
                )
                .cast("long")
                .alias("rev"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )

        def avg_ranks(vals):
            order = sorted(range(len(vals)), key=lambda i: vals[i])
            ranks = [0.0] * len(vals)
            i = 0
            while i < len(order):
                j = i
                while j < len(order) and vals[order[j]] == vals[order[i]]:
                    j += 1
                r = (i + 1 + j) / 2.0  # average of ranks i+1..j
                for k in range(i, j):
                    ranks[order[k]] = r
                i = j
            return ranks

        xs = avg_ranks([r.rev for r in daily])
        ys = avg_ranks([r.n for r in daily])
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
        sy = math.sqrt(sum((y - my) ** 2 for y in ys))
        expect = cov / (sx * sy)
        row = os_.spearman_daily(spark, sf_medium).collect()[0]
        assert row.n_days == n
        assert abs(row.spearman_rho - expect) < 2e-6
        assert -1.0 <= row.spearman_rho <= 1.0


class TestOrderFillRate:
    def test_sla_counts_monotone(self, spark, sf_medium):
        from flink_learning_practise_spark.plans import order_stats as os_

        rows = os_.order_fill_rate(spark, sf_medium).collect()
        assert rows
        for r in rows:
            assert (
                0
                <= r.n_within_30d
                <= r.n_within_60d
                <= r.n_within_90d
                <= r.n_orders
            )
            assert 0.0 <= r.fill_rate_30d <= r.fill_rate_90d <= 1.0


class TestMixtureEpochs:
    def test_budget_and_share_accounting(self, spark, sf_medium):
        from flink_learning_practise_spark.plans import curation as cur

        rows = cur.mixture_epochs(spark, sf_medium).collect()
        assert rows
        # floors can undershoot but never overshoot the budget
        assert sum(r.sampled_tokens for r in rows) <= cur.MIX_TOKEN_BUDGET
        assert abs(sum(r.mix_share for r in rows) - 1.0) < 1e-3
        for r in rows:
            assert r.sampled_tokens >= 0 and r.avail_tokens > 0
            # epochs ≈ sampled/available at the 1e-6 quantum
            assert (
                abs(r.epochs - r.sampled_tokens / r.avail_tokens) < 2e-6
            )


class TestLangTables:
    def test_confusion_row_sums_equal_lang_counts(self, spark, sf_medium):
        from flink_learning_practise_spark.plans import llm_pipeline as llm

        rows = llm.lang_confusion(spark, sf_medium).collect()
        docs = load(spark, sf_medium, "documents")
        counts = {r.lang: r.c for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
        by_lang: dict[str, int] = {}
        for r in rows:
            by_lang[r.lang] = by_lang.get(r.lang, 0) + r.n
        assert by_lang == counts
        # recall shares within each label sum to 1 at the quantum
        shares: dict[str, float] = {}
        for r in rows:
            shares[r.lang] = shares.get(r.lang, 0.0) + r.recall_share
        assert all(abs(s - 1.0) < 1e-3 for s in shares.values())

    def test_fertility_bounds(self, spark, sf_medium):
        from flink_learning_practise_spark.plans import llm_pipeline as llm

        rows = llm.token_fertility(spark, sf_medium).collect()
        assert {r.lang for r in rows} == {"en", "de", "fr", "es", "zh"}
        for r in rows:
            # BPE-ish regex splits at least once per whitespace word
            assert r.fertility >= 1.0
            assert r.chars_per_bpe_token > 0.0


class TestMmrRerank:
    def test_selection_matches_numpy_greedy(self, spark, sf_medium):
        """Full greedy replay from raw embeddings in numpy (round@6
        cosines, λ=0.5): the selected doc sequence and scores must
        match — an independent implementation, not a SQL replay."""
        import numpy as np

        from flink_learning_practise_spark.plans import llm_pipeline as llm

        emb = {
            r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in load(spark, sf_medium, "embeddings").collect()
        }
        qv = emb[llm.RRF_QUERY_VEC_ID]
        qn = np.linalg.norm(qv)

        def cos(u, un, v, vn):
            return round(float(np.dot(u, v) / (un * vn)), 6)

        norms = {i: np.linalg.norm(v) for i, v in emb.items()}
        rel = {
            i: cos(qv, qn, v, norms[i])
            for i, v in emb.items()
            if i != llm.RRF_QUERY_VEC_ID
        }
        pool = sorted(rel, key=lambda i: (-rel[i], i))[: llm.MMR_POOL]
        selected, expect = [], []
        while len(selected) < llm.MMR_K and len(selected) < len(pool):
            best = None
            for d in pool:
                if d in selected:
                    continue
                mx = max(
                    (cos(emb[d], norms[d], emb[s], norms[s]) for s in selected),
                    default=0.0,
                )
                score = 0.5 * rel[d] - 0.5 * mx
                if best is None or (score, -d) > (best[0], -best[1]):
                    best = (score, d)
            selected.append(best[1])
            expect.append((len(selected), best[1], best[0]))
        got = [
            (r.step, r.doc_id, r.mmr_score)
            for r in llm.mmr_rerank(spark, sf_medium).orderBy("step").collect()
        ]
        assert [(s, d) for s, d, _ in got] == [(s, d) for s, d, _ in expect]
        for (_, _, g), (_, _, e) in zip(got, expect):
            assert abs(g - e) < 2e-6

    def test_diversifies_vs_pure_relevance(self, spark, sf_medium):
        """MMR must start at the relevance argmax and never pick a doc
        twice; steps are contiguous."""
        from flink_learning_practise_spark.plans import llm_pipeline as llm

        rows = llm.mmr_rerank(spark, sf_medium).orderBy("step").collect()
        assert [r.step for r in rows] == list(range(1, len(rows) + 1))
        assert len({r.doc_id for r in rows}) == len(rows)
        assert rows[0].rel == max(r.rel for r in rows)
        # marginal score is bounded by the sim range: |sim| ≤ 1 ⇒
        # 0.5·rel − 0.5 ≤ mmr_score ≤ 0.5·rel + 0.5 (sims may be
        # NEGATIVE on this synthetic corpus, so the naive
        # "≤ 0.5·rel" bound does not hold)
        for r in rows[1:]:
            assert 0.5 * r.rel - 0.5 - 1e-12 <= r.mmr_score <= 0.5 * r.rel + 0.5 + 1e-12


class TestPackingEfficiency:
    def test_anchored_to_pack_sequences_and_monotone(self, spark, sf_medium):
        """The ladder row at PACK_CAPACITY must agree with #71's packer
        output exactly; utilization improves (or holds) as capacity
        shrinks for this corpus of sub-capacity docs."""
        from flink_learning_practise_spark.plans import curation as cur

        rows = {
            r.capacity: r
            for r in cur.packing_efficiency(spark, sf_medium).collect()
        }
        assert set(rows) == set(cur.PACK_LADDER)
        packs = cur.pack_sequences(spark, sf_medium).collect()
        anchor = rows[cur.PACK_CAPACITY]
        assert anchor.n_packs == len(packs)
        assert anchor.total_tokens == sum(p.n_tokens for p in packs)
        for r in rows.values():
            assert r.n_overflow_packs <= r.n_packs
            assert 0.0 < r.utilization
            # total tokens identical across capacities (same corpus)
            assert r.total_tokens == anchor.total_tokens


class TestRetrievalOverlap:
    def test_counts_match_python_sets(self, spark, sf_medium):
        from flink_learning_practise_spark.operators import similarity
        from flink_learning_practise_spark.plans import llm_pipeline as llm

        emb = load(spark, sf_medium, "embeddings")
        sparse = {
            r.doc_id for r in llm.bm25_search(spark, sf_medium).collect()
        }
        dense = {
            r.neighbor_id
            for r in similarity.knn_bruteforce(
                emb,
                emb.filter(F.col("vec_id") == llm.RRF_QUERY_VEC_ID),
                k=llm.RRF_TOP_N,
            ).collect()
        }
        row = llm.retrieval_overlap(spark, sf_medium).collect()[0]
        assert row.n_sparse == len(sparse)
        assert row.n_dense == len(dense)
        assert row.n_common == len(sparse & dense)
        assert row.n_sparse_only == len(sparse - dense)
        assert row.n_dense_only == len(dense - sparse)
        union = len(sparse | dense)
        assert abs(row.jaccard_at_k - len(sparse & dense) / union) < 2e-6


class TestAnnRecall:
    def test_recall_consistent_with_set_intersections(self, spark, sf_medium):
        """Recompute recall@K from the three operators' collected
        result sets — and pin the family recall floors the SURVEY
        claims (LSH ≥ 0.5, IVF ≥ 0.5 mean recall on this corpus)."""
        from flink_learning_practise_spark.operators import similarity
        from flink_learning_practise_spark.plans import llm_pipeline as llm

        emb = load(spark, sf_medium, "embeddings")
        queries = emb.filter(F.col("vec_id") < llm.KNN_QUERY_MAX_ID)
        bf: dict[int, set] = {}
        for r in similarity.knn_bruteforce(emb, queries, k=llm.KNN_K).collect():
            bf.setdefault(r.query_id, set()).add(r.neighbor_id)
        fams = {
            "ivf": similarity.knn_ivf(
                emb, queries, k=llm.KNN_K,
                nlist=llm.IVF_NLIST, nprobe=llm.IVF_NPROBE,
            ),
            "lsh": similarity.knn_lsh(
                emb, queries, k=llm.KNN_K, planes=llm.LSH_PLANES,
                tables=llm.LSH_TABLES, dim=llm.EMB_DIM,
            ),
        }
        approx: dict[tuple[str, int], set] = {}
        for fam, df in fams.items():
            for r in df.collect():
                approx.setdefault((fam, r.query_id), set()).add(r.neighbor_id)
        rows = llm.ann_recall(spark, sf_medium).collect()
        assert len(rows) == 2 * len(bf)
        means: dict[str, list[float]] = {}
        for r in rows:
            want = len(bf[r.query_id] & approx.get((r.family, r.query_id), set()))
            assert r.n_hits == want, (r.family, r.query_id)
            assert abs(r.recall_at_k - want / llm.KNN_K) < 2e-6
            means.setdefault(r.family, []).append(r.recall_at_k)
        for fam, vals in means.items():
            assert sum(vals) / len(vals) >= 0.5, (fam, vals)
