"""Ranking-metric evaluation: exact Mann-Whitney AUC."""

import itertools

import pytest


def _naive_auc(pairs):
    """AUC = mean over (pos, neg) pairs of 1[sp > sn] + 0.5*1[sp == sn]."""
    ps = [s for s, y in pairs if y == 1]
    ns = [s for s, y in pairs if y == 0]
    if not ps or not ns:
        return None
    num = sum(1.0 if sp > sn else 0.5 if sp == sn else 0.0 for sp in ps for sn in ns)
    return num / (len(ps) * len(ns))


def test_group_auc_matches_naive_pairwise(spark):
    """group_auc == the O(n1*n0) pairwise definition, per group, on a
    fixture with heavy ties, a perfect ranker, an inverted ranker, and a
    degenerate all-positive group (NULL auc)."""
    from usearch_spark.operators.evaluate import group_auc

    rows = []
    # group A: mixed with ties straddling the labels
    a = [(10, 1), (10, 0), (8, 1), (7, 0), (7, 1), (7, 0), (3, 0), (3, 1), (1, 0)]
    # group B: perfect separation -> auc 1.0
    b = [(9, 1), (8, 1), (2, 0), (1, 0)]
    # group C: perfectly inverted -> auc 0.0
    c = [(1, 1), (2, 1), (8, 0), (9, 0)]
    # group D: all positive -> NULL
    d = [(5, 1), (6, 1)]
    for g, data in [("A", a), ("B", b), ("C", c), ("D", d)]:
        rows += [(g, s, y) for s, y in data]
    df = spark.createDataFrame(rows, "g string, score long, label int")
    got = {
        r["g"]: (r["n_pos"], r["n_neg"], r["auc"])
        for r in group_auc(df, ["g"], "score", "label").collect()
    }
    for g, data in [("A", a), ("B", b), ("C", c), ("D", d)]:
        n1 = sum(y for _, y in data)
        n0 = len(data) - n1
        want = _naive_auc(data)
        assert got[g][0] == n1 and got[g][1] == n0
        if want is None:
            assert got[g][2] is None
        else:
            assert got[g][2] == pytest.approx(want, abs=0)  # exact, not approx
    assert got["B"][2] == 1.0 and got["C"][2] == 0.0


def test_group_auc_permutation_invariant(spark):
    """Row order never changes the result (the rank math is order-free:
    integer rank-block sums, not a float sweep)."""
    from usearch_spark.operators.evaluate import group_auc

    data = [(4, 1), (4, 0), (2, 1), (9, 0), (9, 1), (1, 0)]
    seen = set()
    for perm in itertools.islice(itertools.permutations(data), 0, 24, 7):
        df = spark.createDataFrame(
            [("g", s, y) for s, y in perm], "g string, score long, label int"
        )
        r = group_auc(df, ["g"], "score", "label").collect()[0]
        seen.add((r["n_pos"], r["n_neg"], r["auc"]))
    assert len(seen) == 1
    assert next(iter(seen))[2] == pytest.approx(_naive_auc(data), abs=0)


def test_ann_recall_full_probe_is_perfect(spark):
    """With n_probe == n_clusters every inverted list is scanned, so the
    ANN top-k IS the brute-force top-k and recall@k == 1.0 for every
    query — the eval's hard upper anchor (mirrors sim_ann_ivf_full)."""
    import hashlib

    from usearch_spark.operators.evaluate import ann_recall_at_k

    def vec(i):
        h = hashlib.md5(str(i).encode()).digest()
        return [float(b) / 255.0 + 0.01 for b in h]

    rows = [(i, vec(i)) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ann_recall_at_k(
        emb, n_queries=6, k=5, n_clusters=4, n_probe=4
    ).collect()
    assert len(out) == 6
    assert all(r["n_hits"] == 5 and r["recall_at_k"] == 1.0 for r in out)


def test_ann_recall_partial_probe_bounded_and_planted_clusters(spark):
    """(1) recall is in [0, 1] with n_hits <= k under a partial probe;
    (2) on two well-separated planted clusters with queries from each,
    a 1-of-2 probe still achieves perfect recall because each query's
    true neighbors share its cell."""
    from usearch_spark.operators.evaluate import ann_recall_at_k

    rows = []
    for i in range(30):
        base = [10.0, 0.0] if i % 2 == 0 else [0.0, 10.0]
        # small deterministic within-cluster jitter, separation >> jitter
        rows.append(
            (i, [base[0] + (i % 7) * 0.01, base[1] + (i % 5) * 0.01, 1.0, 0.5])
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ann_recall_at_k(
        emb, n_queries=4, k=3, n_clusters=2, n_probe=1
    ).collect()
    assert len(out) == 4
    for r in out:
        assert 0 <= r["n_hits"] <= 3
        assert r["recall_at_k"] == r["n_hits"] / 3.0
        assert r["recall_at_k"] == 1.0  # planted separation: same-cell truth


def test_group_ndcg_anchors_and_python_replay(spark):
    """Anchors: a perfect ranker scores ndcg == 1.0 exactly; an inverted
    ranker scores strictly less; an all-zero-grade group emits NULL;
    and an irregular group matches a pure-Python replay of the
    identical injected-weight chain bit-for-bit."""
    import math

    from usearch_spark.operators.evaluate import group_ndcg, ndcg_discounts

    rows = []
    # perfect: score == rel ordering
    for i, rel in enumerate([3, 3, 2, 2, 1, 0, 0]):
        rows.append(("perfect", i, 100 - i, rel))
    # inverted: best grades at the bottom
    for i, rel in enumerate([0, 0, 1, 2, 2, 3, 3]):
        rows.append(("inv", i, 100 - i, rel))
    # zeros
    for i in range(5):
        rows.append(("zero", i, 100 - i, 0))
    # irregular
    irr = [(0, 50, 1), (1, 40, 3), (2, 60, 0), (3, 10, 2), (4, 70, 1), (5, 30, 3)]
    rows += [("irr", i, s, r) for i, s, r in irr]
    df = spark.createDataFrame(rows, "g string, id long, score long, rel int")
    out = {
        r["g"]: r
        for r in group_ndcg(df, ["g"], "score", "rel", "id", k=5).collect()
    }
    assert out["perfect"]["ndcg"] == 1.0
    assert out["inv"]["ndcg"] < out["perfect"]["ndcg"]
    assert out["zero"]["ndcg"] is None
    w = ndcg_discounts(5)

    def dcg(rels):
        acc = 0.0
        for i, r in enumerate(rels[:5]):
            acc = acc + (2.0 ** r - 1.0) * w[i]
        return acc

    by_score = [r for _, _, r in sorted(irr, key=lambda t: (-t[1], t[0]))]
    ideal = sorted((r for _, _, r in irr), reverse=True)
    assert out["irr"]["dcg"] == dcg(by_score)
    assert out["irr"]["idcg"] == dcg(ideal)
    assert out["irr"]["ndcg"] == dcg(by_score) / dcg(ideal)
    assert math.isclose(out["irr"]["ndcg"], 0.5, abs_tol=0.5)  # sanity: in (0,1)


def test_calibration_bins_exact_and_perfectly_calibrated_anchor(spark):
    """Anchors: (1) exact integer replay of every bin statistic on a
    small irregular group; (2) a perfectly calibrated construction
    (label == indicator of the top-p fraction drawn uniformly by rank)
    puts obs_rate monotone with mean_pred; (3) bins are equal-population
    within one row."""
    from usearch_spark.operators.evaluate import calibration_bins

    # group of 20: label = 1 iff rank > 10 (score IS the rank order)
    rows = [("g", i, i * 7 + 3, 1 if i >= 10 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, id long, score long, label int")
    out = {
        r["bin"]: r
        for r in calibration_bins(
            df, ["g"], "score", "label", "id", n_bins=4
        ).collect()
    }
    assert sorted(out) == [0, 1, 2, 3]
    n = 20
    for b, r in out.items():
        assert r["n_bin"] == 5
        ranks = range(b * 5 + 1, b * 5 + 6)
        ys = [1 if rk > 10 else 0 for rk in ranks]
        assert r["mean_pred"] == sum(ranks) / (n * 5)
        assert r["obs_rate"] == sum(ys) / 5
        sq = sum((rk - y * n) ** 2 for rk, y in zip(ranks, ys))
        assert r["brier"] == sq / (n * n * 5)
    # perfect separation: low bins all 0, high bins all 1
    assert out[0]["obs_rate"] == 0.0 and out[3]["obs_rate"] == 1.0


def test_group_rbo_anchors_and_python_replay(spark):
    """Anchors: identical rankings score exactly sum((1-p)p^(d-1)) =
    1 - p^k; fully disjoint top-k prefixes score 0; a constructed
    half-agreeing group matches a pure-Python replay of the identical
    injected-weight chain."""
    from usearch_spark.operators.evaluate import group_rbo, rbo_weights

    rows = []
    # same: both scores identical -> identical rankings
    for i in range(10):
        rows.append(("same", i, 100 - i, 100 - i))
    # disjoint: a-top is 0..4, b-top is 5..9 (k=5)
    for i in range(10):
        rows.append(("disj", i, 100 - i, 100 + i))
    # irregular: b swaps adjacent pairs of a's order
    order_b = [1, 0, 3, 2, 5, 4, 7, 6, 9, 8]
    for i in range(10):
        rows.append(("irr", i, 100 - i, 100 - order_b.index(i)))
    df = spark.createDataFrame(rows, "g string, id long, a long, b long")
    k, p = 5, 0.5
    out = {
        r["g"]: r for r in group_rbo(df, ["g"], "a", "b", "id", k=k, p=p).collect()
    }
    # same: overlap_d == d at every depth
    want_same = 0.0
    for d, w in enumerate(rbo_weights(k, p), 1):
        want_same = want_same + float(d) * w
    assert out["same"]["rbo"] == want_same
    assert out["same"]["overlap_at_k"] == k
    assert out["disj"]["rbo"] == 0.0 and out["disj"]["overlap_at_k"] == 0
    # irregular python replay: ranks and max-rank prefix counts
    ra = {i: i + 1 for i in range(10)}  # a-order: id 0 first
    rb = {i: order_b[i] + 1 for i in range(10)}
    want_irr = 0.0
    for d, w in enumerate(rbo_weights(k, p), 1):
        ov = sum(1 for i in range(10) if max(ra[i], rb[i]) <= d)
        want_irr = want_irr + float(ov) * w
    assert out["irr"]["rbo"] == want_irr


def test_group_ks_matches_naive_sweep(spark):
    """group_ks == the O(n) naive threshold sweep on a tied, mixed
    fixture; perfect separation gives ks == 1.0 at the top negative
    score; all-positive groups emit NULL."""
    from usearch_spark.operators.evaluate import group_ks

    a = [(10, 1), (10, 0), (8, 1), (7, 0), (7, 1), (7, 0), (3, 0), (3, 1), (1, 0)]
    b = [(9, 1), (8, 1), (2, 0), (1, 0)]  # perfect: ks = 1 at s = 2
    d = [(5, 1), (6, 1)]
    rows = [(g, s, y) for g, data in [("A", a), ("B", b), ("D", d)] for s, y in data]
    df = spark.createDataFrame(rows, "g string, score long, label int")
    out = {r["g"]: r for r in group_ks(df, ["g"], "score", "label").collect()}

    def naive(data):
        n1 = sum(y for _, y in data)
        n0 = len(data) - n1
        best, best_s = -1, None
        for t in sorted({s for s, _ in data}):
            cp = sum(1 for s, y in data if s <= t and y == 1)
            cn = sum(1 for s, y in data if s <= t and y == 0)
            m = abs(cp * n0 - cn * n1)
            if m > best:  # ties keep the LOWEST threshold
                best, best_s = m, t
        return best / (n1 * n0), best_s

    for g, data in [("A", a), ("B", b)]:
        ks, s = naive(data)
        assert out[g]["ks"] == ks and out[g]["ks_score"] == s
    assert out["B"]["ks"] == 1.0 and out["B"]["ks_score"] == 2
    assert out["D"]["ks"] is None and out["D"]["ks_score"] is None


def _naive_ap_at_k(pairs, k=20):
    """AP@k = (1/min(n_pos,k)) * sum over top-k hits of precision@rank,
    rank order = score desc, id asc."""
    ranked = sorted(pairs, key=lambda t: (-t[1], t[0]))  # (id, score, y)
    n_pos = sum(y for _, _, y in ranked)
    if n_pos == 0:
        return None
    hits, total = 0, 0.0
    for i, (_, _, y) in enumerate(ranked[:k], start=1):
        if y:
            hits += 1
            total += hits / i
    return total / min(n_pos, k)


def test_group_avg_precision_matches_naive(spark):
    """group_avg_precision == the textbook AP@k definition on fixtures
    covering: perfect ranker (AP 1), inverted ranker, positives past k,
    score ties broken by id, and a no-positive group (NULL)."""
    from usearch_spark.operators.evaluate import group_avg_precision

    cases = {
        # (id, score, label)
        "perfect": [(i, 100 - i, 1 if i < 3 else 0) for i in range(10)],
        "inverted": [(i, i, 1 if i < 3 else 0) for i in range(10)],
        "deep": [(i, 100 - i, 1 if i in (0, 5, 24) else 0) for i in range(30)],
        "ties": [(0, 5, 0), (1, 5, 1), (2, 5, 0), (3, 5, 1), (4, 1, 1)],
        "nopos": [(i, i, 0) for i in range(4)],
    }
    rows = [(g, i, s, y) for g, data in cases.items() for i, s, y in data]
    df = spark.createDataFrame(rows, "g string, id long, score long, label int")
    got = {
        r["g"]: (r["n_pos"], r["hits_at_k"], r["ap_at_k"])
        for r in group_avg_precision(df, ["g"], "score", "label", "id", k=20).collect()
    }
    for g, data in cases.items():
        want = _naive_ap_at_k(data, k=20)
        n_pos = sum(y for _, _, y in data)
        assert got[g][0] == n_pos
        if want is None:
            assert got[g][2] is None
        else:
            assert got[g][2] == pytest.approx(want, rel=1e-12)
    assert got["perfect"][2] == 1.0


def test_group_avg_precision_exact_integer_numerator(spark):
    """The lcm trick reproduces the fraction EXACTLY: AP of one positive
    at rank 3 among 5 rows is exactly (1/3)/1 -> numerator L/3, denom L."""
    from usearch_spark.operators.evaluate import group_avg_precision, ap_lcm

    rows = [("g", i, 10 - i, 1 if i == 2 else 0) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, id long, score long, label int")
    r = group_avg_precision(df, ["g"], "score", "label", "id", k=20).collect()[0]
    L = ap_lcm(20)
    assert r["ap_at_k"] == (L // 3) / L  # the exact double the op promises


def test_group_mrr_anchors(spark):
    """First-positive rank, top-k cutoff zero, and NULL-degenerate group."""
    from usearch_spark.operators.evaluate import group_mrr

    cases = {
        "at1": [(0, 9, 1), (1, 8, 0)],
        "at4": [(i, 10 - i, 1 if i == 3 else 0) for i in range(6)],
        "past_k": [(i, 100 - i, 1 if i == 25 else 0) for i in range(30)],
        "nopos": [(i, i, 0) for i in range(3)],
        "tie_id_break": [(0, 5, 0), (1, 5, 1)],  # same score: id 0 ranks first
    }
    rows = [(g, i, s, y) for g, data in cases.items() for i, s, y in data]
    df = spark.createDataFrame(rows, "g string, id long, score long, label int")
    got = {
        r["g"]: (r["n_pos"], r["first_rank"], r["rr_at_k"])
        for r in group_mrr(df, ["g"], "score", "label", "id", k=20).collect()
    }
    assert got["at1"] == (1, 1, 1.0)
    assert got["at4"] == (1, 4, 0.25)
    assert got["past_k"] == (1, 26, 0.0)  # positive exists but beyond k
    assert got["nopos"] == (0, None, None)
    assert got["tie_id_break"] == (1, 2, 0.5)


def test_group_classification_metrics_matches_hand_count(spark):
    """Top-decile cut confusion counts and single-divide metrics equal a
    hand count, including the degenerate no-positive group and a group
    too small for a nonzero cut (n_pred = 0 -> NULL precision)."""
    from usearch_spark.operators.evaluate import group_classification_metrics

    # group A: 20 rows, scores = id desc, positives at ids 0,1,5 ->
    # cut keeps ids 0,1 (n_pred=2), tp=2
    a = [("A", i, 100 - i, 1 if i in (0, 1, 5) else 0) for i in range(20)]
    # group B: 5 rows -> n_pred = 0
    b = [("B", i, 10 - i, 1 if i == 0 else 0) for i in range(5)]
    # group C: no positives
    c = [("C", i, i, 0) for i in range(30)]
    df = spark.createDataFrame(a + b + c, "g string, id long, score long, label int")
    got = {
        r["g"]: r
        for r in group_classification_metrics(
            df, ["g"], "score", "label", "id", top_den=10
        ).collect()
    }
    ra = got["A"]
    assert (ra["n"], ra["n_pos"], ra["n_pred"], ra["tp"]) == (20, 3, 2, 2)
    assert ra["prec"] == 1.0
    assert ra["rec"] == 2 / 3
    assert ra["f1"] == 4 / 5  # 2*2/(2+3)
    assert ra["accuracy"] == (20 - 2 - 3 + 4) / 20
    rb = got["B"]
    assert (rb["n_pred"], rb["tp"]) == (0, 0)
    assert rb["prec"] is None and rb["rec"] == 0.0
    rc = got["C"]
    assert rc["rec"] is None and rc["f1"] == 0.0 and rc["tp"] == 0


def _naive_spearman(pairs):
    """Pearson over midranks, the textbook tie-handled Spearman."""
    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            avg = (i + j) / 2.0 + 1.0
            for t in range(i, j + 1):
                r[order[t]] = avg
            i = j + 1
        return r
    rx = midranks([x for x, _ in pairs])
    ry = midranks([y for _, y in pairs])
    n = len(pairs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = sum((a - mx) ** 2 for a in rx)
    dy = sum((b - my) ** 2 for b in ry)
    if dx == 0 or dy == 0:
        return None
    return num / (dx ** 0.5 * dy ** 0.5)


def test_group_spearman_matches_naive_with_ties(spark):
    from usearch_spark.operators.evaluate import group_spearman

    cases = {
        "mono": [(i, i * i) for i in range(10)],          # rho = 1
        "anti": [(i, -i) for i in range(10)],             # rho = -1
        "ties": [(1, 5), (1, 7), (2, 5), (3, 9), (3, 5), (4, 7), (4, 7)],
        "const": [(3, v) for v in range(5)],              # NULL (x constant)
    }
    rows = [(g, x, y) for g, data in cases.items() for x, y in data]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: (r["n"], r["spearman_rho"])
        for r in group_spearman(df, ["g"], "x", "y").collect()
    }
    for g, data in cases.items():
        want = _naive_spearman(data)
        assert got[g][0] == len(data)
        if want is None:
            assert got[g][1] is None
        else:
            assert got[g][1] == pytest.approx(want, rel=1e-12)
    assert got["mono"][1] == 1.0 and got["anti"][1] == -1.0


def test_group_gains_perfect_and_random_anchors(spark):
    """A perfect ranker captures all positives in the first decile with
    lift = n/n_pos-capped decile lift; bucket counts are equal-population;
    the final row always has capture 1 and lift 1."""
    from usearch_spark.operators.evaluate import group_gains

    # 100 rows, 10 positives, perfectly ranked to the top
    rows = [("g", i, 1000 - i, 1 if i < 10 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, id long, score long, label int")
    out = {r["bucket"]: r for r in group_gains(df, ["g"], "score", "label", "id").collect()}
    assert len(out) == 10 and all(out[b]["n_bucket"] == 10 for b in out)
    assert out[0]["n_pos"] == 10 and out[0]["capture"] == 1.0
    assert out[0]["lift"] == 10.0  # all mass in the top 10%
    assert out[9]["capture"] == 1.0 and out[9]["lift"] == 1.0
    assert out[5]["cum_n"] == 60


def test_group_gains_no_positive_group_nulls(spark):
    from usearch_spark.operators.evaluate import group_gains

    rows = [("g", i, i, 0) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, id long, score long, label int")
    out = group_gains(df, ["g"], "score", "label", "id").collect()
    assert all(r["capture"] is None and r["lift"] is None for r in out)


def _naive_kendall(pairs):
    """O(n^2) tau-b from the definition, for cross-checking."""
    import itertools
    import math

    C = D = tx = ty = 0
    n = len(pairs)
    for (x1, y1), (x2, y2) in itertools.combinations(pairs, 2):
        if x1 == x2 and y1 == y2:
            tx += 1
            ty += 1
        elif x1 == x2:
            tx += 1
        elif y1 == y2:
            ty += 1
        elif (x2 - x1) * (y2 - y1) > 0:
            C += 1
        else:
            D += 1
    n0 = n * (n - 1) // 2
    if n0 <= tx or n0 <= ty:
        return C, D, None
    return C, D, (C - D) / (math.sqrt(n0 - tx) * math.sqrt(n0 - ty))


def test_group_kendall_matches_naive_all_tie_structures(spark):
    from usearch_spark.operators.evaluate import group_kendall

    cases = {
        "mono": [(i, i * i) for i in range(9)],
        "anti": [(i, -i) for i in range(7)],
        "ties": [(1, 5), (1, 7), (2, 5), (3, 9), (3, 5), (4, 7), (4, 7), (2, 9)],
        "dup_cells": [(1, 1)] * 3 + [(2, 2)] * 2 + [(1, 2), (2, 1)],
        "const_y": [(i, 4) for i in range(5)],  # NULL (all y-pairs tied)
    }
    rows = [(g, x, y) for g, data in cases.items() for x, y in data]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in group_kendall(df, ["g"], "x", "y").collect()}
    for g, data in cases.items():
        C, D, tb = _naive_kendall(data)
        r = got[g]
        assert (r["n_concordant"], r["n_discordant"]) == (C, D), g
        if tb is None:
            assert r["tau_b"] is None
        else:
            assert r["tau_b"] == pytest.approx(tb, abs=1e-15)


def test_group_mcc_matches_textbook(spark):
    """MCC on the top-decile cut equals the textbook confusion formula,
    including the perfect cut (mcc 1.0), an anti-correlated cut, and
    degenerate marginals (NULL)."""
    from usearch_spark.operators.evaluate import group_mcc

    # group A: 20 rows, positives at the top two scores -> cut = top 2,
    # tp=2, fp=0, fn=1 (a third positive at rank 6)
    a = [("A", i, 100 - i, 1 if i in (0, 1, 5) else 0) for i in range(20)]
    # group P: perfect — positives exactly the top decile
    p = [("P", i, 100 - i, 1 if i < 2 else 0) for i in range(20)]
    # group C: no positives -> NULL (zero marginal)
    c = [("C", i, i, 0) for i in range(30)]
    df = spark.createDataFrame(a + p + c, "g string, id long, score long, label int")
    got = {
        r["g"]: r
        for r in group_mcc(df, ["g"], "score", "label", "id", top_den=10).collect()
    }

    def naive(n, pos, pp, tp):
        tn = n - pp - pos + tp
        fp, fn = pp - tp, pos - tp
        den = (pp * pos * (n - pp) * (n - pos)) ** 0.5
        return (tp * tn - fp * fn) / den

    ra = got["A"]
    assert (ra["n"], ra["n_pos"], ra["n_pred"], ra["tp"]) == (20, 3, 2, 2)
    assert ra["mcc"] == pytest.approx(naive(20, 3, 2, 2), abs=1e-12)
    assert got["P"]["mcc"] == pytest.approx(1.0, abs=1e-12)
    assert got["C"]["mcc"] is None


def test_group_kappa_matches_textbook(spark):
    """Kappa via the n²-cleared single divide equals the textbook
    (po − pe)/(1 − pe), and a chance-level cut lands near 0."""
    from usearch_spark.operators.evaluate import group_kappa

    a = [("A", i, 100 - i, 1 if i in (0, 1, 5) else 0) for i in range(20)]
    p = [("P", i, 100 - i, 1 if i < 2 else 0) for i in range(20)]
    df = spark.createDataFrame(a + p, "g string, id long, score long, label int")
    got = {
        r["g"]: r
        for r in group_kappa(df, ["g"], "score", "label", "id", top_den=10).collect()
    }

    def naive(n, pos, pp, tp):
        tn = n - pp - pos + tp
        po = (tp + tn) / n
        pe = (pp * pos + (n - pp) * (n - pos)) / n**2
        return (po - pe) / (1 - pe)

    assert got["A"]["kappa"] == pytest.approx(naive(20, 3, 2, 2), abs=1e-12)
    assert got["P"]["kappa"] == pytest.approx(1.0, abs=1e-12)


def test_group_mcnemar_matches_hand_count(spark):
    """Discordant counts and chi2 equal a hand count; identical models
    (b + c = 0) emit NULL."""
    from usearch_spark.operators.evaluate import group_mcnemar

    # 20 rows; label = 1 for ids 0,1,5.  Champion score ranks by id asc
    # (cut = ids 0,1 -> both correct).  Challenger ranks ids 4,5 on top
    # (cut = ids 4,5 -> catches 5, misses 0,1).
    rows = []
    for i in range(20):
        y = 1 if i in (0, 1, 5) else 0
        sa = 100 - i
        sb = 100 - i + (50 if i in (4, 5) else 0)
        rows.append(("A", i, sa, sb, y))
        rows.append(("S", i, sa, sa, y))  # same model twice -> b=c=0
    df = spark.createDataFrame(
        rows, "g string, id long, sa long, sb long, label int"
    )
    got = {
        r["g"]: r
        for r in group_mcnemar(
            df, ["g"], "sa", "sb", "label", "id", top_den=10
        ).collect()
    }
    ra = got["A"]
    # champion verdicts: pred {0,1}: correct on 0,1 (tp), wrong on 5 (fn)
    #   -> correct rows = all except id 5 => 19
    # challenger: pred {4,5}: wrong on 0,1 (fn), wrong on 4 (fp), right on 5
    #   -> correct rows = all except 0,1,4 => 17
    assert (ra["a_correct"], ra["b_correct"]) == (19, 17)
    # discordant: A right/B wrong on 0,1,4 -> b=3; A wrong/B right on 5 -> c=1
    assert (ra["only_a"], ra["only_b"]) == (3, 1)
    assert ra["mcnemar_chi2"] == pytest.approx((3 - 1) ** 2 / 4, abs=1e-15)
    rs = got["S"]
    assert (rs["only_a"], rs["only_b"]) == (0, 0)
    assert rs["mcnemar_chi2"] is None


def test_group_mannwhitney_matches_textbook(spark):
    """u1 equals the pairwise count (wins + half-ties) and z equals the
    tie-corrected normal approximation; all-tied scores emit NULL z."""
    from usearch_spark.operators.evaluate import group_mannwhitney

    a = [(10, 1), (10, 0), (8, 1), (7, 0), (7, 1), (7, 0), (3, 0), (3, 1), (1, 0)]
    t = [(5, 1), (5, 0), (5, 1), (5, 0)]  # all tied -> z NULL, u1 = n1*n0/2
    rows = [("A", s, y) for s, y in a] + [("T", s, y) for s, y in t]
    df = spark.createDataFrame(rows, "g string, score long, label int")
    got = {
        r["g"]: r for r in group_mannwhitney(df, ["g"], "score", "label").collect()
    }

    def naive(pairs):
        ps = [s for s, y in pairs if y == 1]
        ns = [s for s, y in pairs if y == 0]
        u1 = sum(1.0 if p > q else 0.5 if p == q else 0.0 for p in ps for q in ns)
        n1, n0 = len(ps), len(ns)
        n = n1 + n0
        from collections import Counter

        tie = sum(c**3 - c for c in Counter(s for s, _ in pairs).values())
        var = n1 * n0 / 12 * ((n + 1) - tie / (n * (n - 1)))
        z = (u1 - n1 * n0 / 2) / var**0.5 if var > 0 else None
        return u1, z

    u1, z = naive(a)
    assert got["A"]["u1"] == u1
    assert got["A"]["z"] == pytest.approx(z, abs=1e-12)
    assert got["T"]["u1"] == 2.0 and got["T"]["z"] is None


def test_group_auc_bootstrap_matches_python_replay(spark):
    """The deterministic Poisson weights, each replicate's weighted AUC,
    and the pinned-rank band all equal a Python replay."""
    import hashlib

    from usearch_spark.operators.evaluate import (
        group_auc_bootstrap,
        poisson_thresholds,
    )

    rows = [("A", i, 100 - i + (7 if i % 3 == 0 else 0), 1 if i < 8 else 0)
            for i in range(30)]
    df = spark.createDataFrame(rows, "g string, id long, score long, label int")
    got = group_auc_bootstrap(
        df, ["g"], "score", "label", "id", n_boot=20
    ).collect()[0]

    ts = poisson_thresholds(6)

    def u60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def wauc(pairs):
        # pairs: (score, label, weight)
        cells = {}
        for s, y, w in pairs:
            if w > 0:
                c, p = cells.get(s, (0, 0))
                cells[s] = (c + w, p + w * y)
        lower, two_r1, npos, ntot = 0, 0, 0, 0
        for s in sorted(cells):
            c, p = cells[s]
            two_r1 += p * (2 * lower + c + 1)
            lower += c
            npos += p
            ntot += c
        nneg = ntot - npos
        if npos == 0 or nneg == 0:
            return None
        return (two_r1 - npos * (npos + 1)) / (2 * npos * nneg)

    aucs = []
    for b in range(1, 21):
        pairs = []
        for _, i, s, y in rows:
            u = u60(f"{i}:{b}")
            w = sum(1 for t in ts if u >= t)
            pairs.append((s, y, w))
        a = wauc(pairs)
        if a is not None:
            aucs.append(a)
    aucs.sort()
    n = len(aucs)
    assert got["n_boot_valid"] == n
    assert got["ci_lo"] == aucs[max(1, n // 10) - 1]
    assert got["ci_hi"] == aucs[min(n, n - n // 10 + 1) - 1]
    assert got["ci_lo"] <= got["auc"] <= got["ci_hi"] or n < 5


def test_brier_scaled_exact_integer_numerator(spark):
    """Brier over integer-scaled scores replays exactly: scores 0..10
    (D=10), perfect/worst/mid predictions give 0, 1, and 0.25."""
    from usearch_spark.operators.evaluate import brier_scaled

    rows = [
        ("perfect", 10, 1), ("perfect", 0, 0),
        ("worst", 0, 1), ("worst", 10, 0),
        ("mid", 5, 1), ("mid", 5, 0),
    ]
    df = spark.createDataFrame(rows, "g string, s long, y int")
    got = {r["g"]: r for r in brier_scaled(df, ["g"], "s", "y").collect()}
    assert got["perfect"]["brier"] == 0.0
    assert got["worst"]["brier"] == 1.0
    assert got["mid"]["brier"] == 0.25
    assert got["mid"]["n"] == 2 and got["mid"]["n_pos"] == 1


def test_two_proportion_ztest_replay(spark):
    """z and lift replay the pooled two-proportion formula on known
    counts (n0=4/x0=1, n1=4/x1=3)."""
    import math

    from usearch_spark.operators.evaluate import two_proportion_ztest

    rows = [(0, 1), (0, 0), (0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (1, 0)]
    df = spark.createDataFrame(rows, "arm int, converted int")
    r = two_proportion_ztest(df, "arm", "converted").collect()[0]
    p0, p1, pp = 0.25, 0.75, 0.5
    se = math.sqrt(pp * (1 - pp) * (1 / 4 + 1 / 4))
    assert (r["n0"], r["x0"], r["n1"], r["x1"]) == (4, 1, 4, 3)
    assert r["p0"] == p0 and r["p1"] == p1
    assert r["lift"] == (p1 - p0) / p0
    assert r["z"] == (p1 - p0) / se


def test_two_proportion_ztest_degenerate_arms_null(spark):
    """Degenerate arms are NULL, never Inf/NaN: a zero-success control
    gives NULL lift; an all-success (pooled p = 1) experiment gives
    NULL z (se = 0)."""
    from usearch_spark.operators.evaluate import two_proportion_ztest

    zero_ctl = spark.createDataFrame(
        [(0, 0), (0, 0), (1, 1), (1, 0)], "arm int, converted int"
    )
    r = two_proportion_ztest(zero_ctl, "arm", "converted").collect()[0]
    assert r["lift"] is None
    assert r["z"] is not None  # pooled p = 1/4, se > 0

    all_succ = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 1), (1, 1)], "arm int, converted int"
    )
    r = two_proportion_ztest(all_succ, "arm", "converted").collect()[0]
    assert r["z"] is None  # pooled p = 1 -> no spread
    assert r["lift"] == 0.0

    none_succ = spark.createDataFrame(
        [(0, 0), (0, 0), (1, 0), (1, 0)], "arm int, converted int"
    )
    r = two_proportion_ztest(none_succ, "arm", "converted").collect()[0]
    assert r["z"] is None and r["lift"] is None


def test_brier_scaled_degenerate_span_null(spark):
    """A single distinct score (global span D = 0) yields NULL brier,
    not NaN/Inf."""
    from usearch_spark.operators.evaluate import brier_scaled

    df = spark.createDataFrame(
        [("g", 7, 1), ("g", 7, 0)], "g string, s long, y int"
    )
    r = brier_scaled(df, ["g"], "s", "y").collect()[0]
    assert r["brier"] is None
    assert (r["n"], r["n_pos"]) == (2, 1)


def test_markov_attribution_closed_form_replay(spark):
    """The 2-channel removal-effect model replays a hand-built journey
    set: transition counts, the Cramer absorption solve, removal
    effects, and shares all match a Python replay."""
    import datetime

    from pyspark.sql import functions as F

    import __spark_entry__ as E

    # journeys (per user, in time order):
    #   u1: click -> purchase            u2: view -> click -> purchase
    #   u3: view (ends, null)            u4: click -> view (ends, null)
    #   u5: purchase (start -> conv)
    paths = {
        1: ["click", "purchase"],
        2: ["view", "click", "purchase"],
        3: ["view"],
        4: ["click", "view"],
        5: ["purchase"],
    }
    rows = []
    eid = 0
    t0 = datetime.datetime(2024, 1, 1)
    for u, evs in paths.items():
        for i, et in enumerate(evs):
            rows.append((eid, t0 + datetime.timedelta(hours=i), u, et, 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {
            r["channel"]: r
            for r in E.q_events_attribution_markov(spark, d).collect()
        }
    # transition counts:
    # start->click 2 (u1,u4), start->view 2 (u2,u3), start->conv 1 (u5)
    # click->conv 2 (u1,u2), click->view 1 (u4)
    # view->click 1 (u2), view->null 2 (u3,u4 end)
    p_sc, p_sv, p_sconv = 2 / 5, 2 / 5, 1 / 5
    p_cc, p_cv, p_cconv = 0 / 3, 1 / 3, 2 / 3
    p_vc, p_vv, p_vconv = 1 / 3, 0 / 3, 0 / 3
    det = (1 - p_cc) * (1 - p_vv) - p_cv * p_vc
    v_c = (p_cconv * (1 - p_vv) + p_cv * p_vconv) / det
    v_v = (p_vconv * (1 - p_cc) + p_vc * p_cconv) / det
    p_all = p_sconv + p_sc * v_c + p_sv * v_v
    p_wo_c = p_sconv + p_sv * (p_vconv / (1 - p_vv))
    p_wo_v = p_sconv + p_sc * (p_cconv / (1 - p_cc))
    re_c, re_v = 1 - p_wo_c / p_all, 1 - p_wo_v / p_all
    c, v = got["click"], got["view"]
    assert c["n_from"] == 3 and v["n_from"] == 3
    assert c["p_conv_all"] == round(p_all, 6) == v["p_conv_all"]
    assert c["removal_effect"] == round(re_c, 6)
    assert v["removal_effect"] == round(re_v, 6)
    assert c["share"] == re_c / (re_c + re_v)
    # click carries the conversions here: it must dominate
    assert c["removal_effect"] > v["removal_effect"]


def test_expected_calibration_error_exact_integer_fold(spark):
    """Hand-computed 4-row, 2-bin case: bin terms |pos*N - sum_rank| are
    1 and 3, so ECE = 4/16 = 0.25 and MCE = 3/8 = 0.375."""
    from usearch_spark.operators.evaluate import expected_calibration_error

    rows = [("g", 1, 10, 0), ("g", 2, 20, 1), ("g", 3, 30, 0), ("g", 4, 40, 1)]
    df = spark.createDataFrame(rows, "g string, id int, s long, y int")
    r = expected_calibration_error(df, ["g"], "s", "y", "id", n_bins=2).collect()[0]
    assert (r["n"], r["n_bins_used"]) == (4, 2)
    assert r["ece"] == 0.25
    assert r["mce"] == 0.375


def test_psi_identical_distributions_zero_and_shift_positive(spark):
    """PSI anchors: binning the SAME frame against itself gives exactly
    0.0 per bin (p == q -> ln(1) == 0.0, no float residue); a hard
    location shift gives a large PSI; cuts come from the REFERENCE."""
    from usearch_spark.operators.evaluate import population_stability_index

    ref_rows = [("g", v) for v in range(1, 101)]
    ref = spark.createDataFrame(ref_rows, "g string, v long")
    same = population_stability_index(ref, ref, ["g"], "v", n_bins=5).collect()
    assert len(same) == 5
    assert all(r["psi_contrib"] == 0.0 and r["psi"] == 0.0 for r in same)
    assert all(r["n_ref"] == r["n_cur"] == 20 for r in same)

    cur = spark.createDataFrame([("g", v + 80) for v in range(1, 101)], "g string, v long")
    shifted = population_stability_index(ref, cur, ["g"], "v", n_bins=5).collect()
    psi = shifted[0]["psi"]
    assert psi > 1.0  # hard shift: most mass lands in the top bin
    # every current row above the last cut (cut_4 = 80) -> top bin holds 100
    top = {r["bin"]: r for r in shifted}
    assert top[4]["n_cur"] == 100
