"""Operating-point auto-tuner: oracle parity, selection semantics, apply().

The tuner sweeps the real device program against the exact-codec oracle
(the reference's un-pruned scoring, ranking.jl:23-87), so its recall
numbers must agree with brute force and its chosen point must be the
cheapest one meeting the target.
"""

import numpy as np
import pytest

from colbert_tpu.config import ColBERTConfig
from colbert_tpu.evaluation.autotune import (
    OperatingPoint,
    tune_operating_point,
)
from colbert_tpu.evaluation.oracle import exhaustive_scores, oracle_topk
from colbert_tpu.indexing.builder import Indexer
from colbert_tpu.retrieval.searcher import Searcher
from colbert_tpu.utils.testing import make_encoder, synthetic_collection


@pytest.fixture(scope="module")
def tuned_setup(tmp_path_factory):
    cfg = ColBERTConfig(
        dim=32, doc_maxlen=64, query_maxlen=16, index_bsize=8,
        length_bucket=16, chunksize=32, nbits=2, kmeans_niters=6, nprobe=2,
        search_max_candidates=64,
    )
    encoder = make_encoder(dim=32, seed=0, config=cfg)
    passages = synthetic_collection(64, seed=1)
    path = str(tmp_path_factory.mktemp("tune") / "idx")
    Indexer(cfg, encoder=encoder, collection=passages).index(path)
    searcher = Searcher(path, encoder=encoder)
    queries = [p[:64] for p in passages[:8]]
    return searcher, queries


def test_oracle_matches_searcher_bruteforce(tuned_setup):
    import jax.numpy as jnp

    searcher, queries = tuned_setup
    Q = jnp.asarray(searcher.encoder.encode_queries(queries))
    scores = exhaustive_scores(searcher, Q)
    assert scores.shape == (len(queries), len(np.asarray(searcher.doclens)))
    # self-retrieval: each query is its own passage's prefix -> its pid wins
    top1 = oracle_topk(scores, 1)[:, 0]
    assert (top1 == np.arange(len(queries))).mean() == 1.0


GRID = (
    OperatingPoint(0, 8, stage1_refine=False),
    OperatingPoint(0, 64, stage1_refine=False),
    OperatingPoint(0, 64, stage1_refine=True),
)


def test_tune_picks_cheapest_qualifying_point(tuned_setup):
    searcher, queries = tuned_setup
    res = tune_operating_point(
        searcher, queries, k=4, target_score_recall=0.9,
        grid=GRID, time_reps=0,
    )
    assert len(res.table) == len(GRID)
    for t in res.table:
        assert 0.0 <= t.score_recall <= 1.0
        assert 0.0 <= t.set_recall <= 1.0
        assert t.ms_per_batch is None  # time_reps=0
    assert res.met_target
    assert res.chosen.score_recall >= 0.9
    qualifying = [t for t in res.table if t.score_recall >= 0.9]
    assert res.chosen.cost == min(t.cost for t in qualifying)
    # the full-width point scores everything the funnel surfaces: exact
    full = [t for t in res.table if t.point.ncandidates == 64
            and t.point.stage1_refine][0]
    assert full.score_recall == 1.0


def test_tune_unmet_target_falls_back_to_best(tuned_setup):
    searcher, queries = tuned_setup
    res = tune_operating_point(
        searcher, queries, k=4, target_score_recall=1.1,  # impossible
        grid=GRID, time_reps=0,
    )
    assert not res.met_target
    best = max(t.score_recall for t in res.table)
    assert res.chosen.score_recall == best
    # cheapest among the recall maxima
    maxima = [t for t in res.table if t.score_recall == best]
    assert res.chosen.cost == min(t.cost for t in maxima)


def test_apply_sets_config_and_search_follows(tuned_setup):
    searcher, queries = tuned_setup
    res = tune_operating_point(
        searcher, queries, k=4, target_score_recall=0.9,
        grid=GRID, time_reps=0,
    )
    cfg = searcher.config
    before = (cfg.plaid_stage2_docs, cfg.plaid_stage1_refine, cfg.nprobe)
    try:
        res.apply(searcher)
        assert cfg.plaid_stage2_docs == res.chosen.point.ncandidates
        assert cfg.plaid_stage1_refine == res.chosen.point.stage1_refine
        pids, scores = searcher.search_batch(queries, k=4)
        assert pids.shape == (len(queries), 4)
        # applied point keeps self-retrieval intact
        assert (pids[:, 0] == np.arange(len(queries))).mean() == 1.0
    finally:
        (cfg.plaid_stage2_docs, cfg.plaid_stage1_refine, cfg.nprobe) = before


def test_set_balance_cap_matches_fresh_build(tuned_setup):
    """In-process rebalance == building a fresh Searcher at that cap, and
    the HBM payload (codes/residuals/IVF entries) is reused untouched."""
    import os

    searcher, queries = tuned_setup
    orig_cap = searcher.config.ivf_balance_cap
    codes_before = searcher.device_index.codes
    res_before = searcher.device_index.residuals
    ivf_before = searcher.device_index.ivf
    try:
        searcher.set_balance_cap(4)
        assert searcher.config.ivf_balance_cap == 4
        assert searcher.device_index.codes is codes_before
        assert searcher.device_index.residuals is res_before
        assert searcher.device_index.ivf is ivf_before
        p1, s1 = searcher.search_batch(queries, k=4)
        cfg2 = ColBERTConfig.load(
            os.path.join(searcher.index_path, "config.json")
        )
        cfg2.ivf_balance_cap = 4
        fresh = Searcher(searcher.index_path, encoder=searcher.encoder,
                         config=cfg2)
        assert (searcher.device_index.probe_centroids.shape
                == fresh.device_index.probe_centroids.shape)
        assert (searcher.device_index.probe_dup_max
                == fresh.device_index.probe_dup_max)
        p2, s2 = fresh.search_batch(queries, k=4)
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_allclose(s1, s2, rtol=1e-5)
        # cap<=0 = no splitting (config semantics)
        searcher.set_balance_cap(0)
        assert searcher.device_index.probe_dup_max == 1
        assert (searcher.device_index.probe_centroids.shape
                == searcher.device_index.centroids.shape)
    finally:
        searcher.set_balance_cap(orig_cap)


def test_tune_sweeps_balance_caps_and_restores(tuned_setup):
    searcher, queries = tuned_setup
    orig_cap = searcher.config.ivf_balance_cap
    orig_probe_shape = searcher.device_index.probe_centroids.shape
    res = tune_operating_point(
        searcher, queries, k=4, target_score_recall=0.9,
        grid=GRID, time_reps=0, balance_caps=(0, 4),
    )
    # grid runs once per cap; the live searcher is restored afterwards
    assert len(res.table) == 2 * len(GRID)
    assert {t.balance_cap for t in res.table} == {0, 4}
    assert all(t.swept_cap for t in res.table)
    assert searcher.config.ivf_balance_cap == orig_cap
    assert searcher.device_index.probe_centroids.shape == orig_probe_shape
    # apply() re-balances to the chosen cap
    cfg = searcher.config
    before = (cfg.plaid_stage2_docs, cfg.plaid_stage1_refine, cfg.nprobe,
              cfg.refine_width_factor)
    try:
        res.apply(searcher)
        assert cfg.ivf_balance_cap == res.chosen.balance_cap
        pids, _ = searcher.search_batch(queries, k=4)
        assert (pids[:, 0] == np.arange(len(queries))).mean() == 1.0
    finally:
        (cfg.plaid_stage2_docs, cfg.plaid_stage1_refine, cfg.nprobe,
         cfg.refine_width_factor) = before
        searcher.set_balance_cap(orig_cap)


def test_tune_depth_target(tuned_setup):
    searcher, queries = tuned_setup
    res = tune_operating_point(
        searcher, queries, k=4, target_score_recall=0.9,
        grid=GRID, time_reps=0, depth_k=8, target_depth_recall=0.9,
    )
    assert res.depth_k == 8
    for t in res.table:
        assert t.depth_score_recall is not None
        assert 0.0 <= t.depth_score_recall <= 1.0
    if res.met_target:
        assert res.chosen.score_recall >= 0.9
        assert res.chosen.depth_score_recall >= 0.9
    assert "@depth" in str(res)


def test_tune_raw_path_with_Q_matches_production(tuned_setup):
    """Pre-encoded Q sweeps the raw search_Q_batch path; the recall table
    must agree with the production-path sweep (same knobs, same funnel)."""
    import jax.numpy as jnp

    searcher, queries = tuned_setup
    res_prod = tune_operating_point(
        searcher, queries, k=4, target_score_recall=0.9,
        grid=GRID, time_reps=0,
    )
    Q = jnp.asarray(searcher.encoder.encode_queries(queries))
    res_raw = tune_operating_point(
        searcher, Q=Q, k=4, target_score_recall=0.9,
        grid=GRID, time_reps=0,
    )
    for tp, tr in zip(res_prod.table, res_raw.table):
        assert tp.score_recall == tr.score_recall
        assert tp.set_recall == tr.set_recall


def test_refine_width_point_in_grid(tuned_setup):
    searcher, queries = tuned_setup
    grid = (
        OperatingPoint(0, 8, stage1_refine=True, refine_width=2),
        OperatingPoint(0, 8, stage1_refine=True, refine_width=4),
    )
    res = tune_operating_point(
        searcher, queries, k=4, target_score_recall=0.0,
        grid=grid, time_reps=0,
    )
    # narrower refine window costs less in the analytic model
    assert res.table[0].cost < res.table[1].cost
    assert "rw=2" in res.table[0].point.label()
    assert "rw=" not in res.table[1].point.label()


def test_max_candidates_point_label_cost_and_apply(tuned_setup):
    """The selection-width override (the binding depth@100 knob at scale —
    SCALE.md 1M depth sweep) labels, costs, sweeps, and persists."""
    kw = dict(nprobe=4, lq=16, cell_cap=64, max_doclen=32,
              max_candidates=4096)
    base = OperatingPoint(0, 4096, stage1_refine=True)
    wide = OperatingPoint(0, 4096, stage1_refine=True, max_candidates=16384)
    assert "maxc=16384" in wide.label() and "maxc" not in base.label()
    # wider selection width = more refine rows = higher analytic cost
    assert wide.cost(**kw) > base.cost(**kw)

    searcher, queries = tuned_setup
    cfg = searcher.config
    saved = (cfg.plaid_stage2_docs, cfg.plaid_stage1_refine, cfg.nprobe,
             cfg.refine_width_factor, cfg.search_max_candidates,
             searcher.max_candidates)
    try:
        point = OperatingPoint(0, 8, stage1_refine=True, max_candidates=128)
        res = tune_operating_point(
            searcher, queries, k=4, target_score_recall=0.0,
            grid=(point,), time_reps=0,
        )
        assert res.chosen.point.max_candidates == 128
        # the sweep itself must not leak the override into the live searcher
        assert searcher.max_candidates == saved[5]
        res.apply(searcher)
        assert searcher.max_candidates == 128
        assert cfg.search_max_candidates == 128
        pids, _ = searcher.search_batch(queries, k=4)
        assert (pids[:, 0] == np.arange(len(queries))).mean() == 1.0
    finally:
        (cfg.plaid_stage2_docs, cfg.plaid_stage1_refine, cfg.nprobe,
         cfg.refine_width_factor, cfg.search_max_candidates,
         searcher.max_candidates) = saved


def test_depth_target_extends_default_grid(tuned_setup):
    """A depth target on the DEFAULT grid adds the wide-selection points
    (depth@100 at scale is bound by max_candidates, not ncandidates);
    custom grids stay untouched (test_tune_depth_target)."""
    import jax.numpy as jnp

    searcher, queries = tuned_setup
    Q = jnp.asarray(searcher.encoder.encode_queries(queries))
    res = tune_operating_point(
        searcher, Q=Q, k=4, target_score_recall=0.9,
        time_reps=0, depth_k=8, target_depth_recall=0.9,
    )
    wide = [t for t in res.table if t.point.max_candidates is not None]
    assert len(wide) == 3
    assert all("maxc=16384" in t.point.label() for t in wide)
    for t in wide:
        assert t.depth_score_recall is not None


def test_cost_model_orders_points_sanely():
    kw = dict(nprobe=4, lq=16, cell_cap=64, max_doclen=32, max_candidates=4096)
    cheap = OperatingPoint(0, 128, stage1_refine=False).cost(**kw)
    mid = OperatingPoint(0, 128, stage1_refine=True).cost(**kw)
    wide = OperatingPoint(0, 1024, stage1_refine=True).cost(**kw)
    probes = OperatingPoint(2, 128, stage1_refine=False).cost(**kw)
    assert cheap < mid < wide
    assert cheap < probes < mid  # +2 probes costs less than the refine

    res_str = str
    # __str__ smoke (formatting only)
    from colbert_tpu.evaluation.autotune import TunedPoint, TuneResult

    t = TunedPoint(OperatingPoint(0, 128, False), 0.99, 0.97, cheap, 12.3)
    s = res_str(TuneResult(chosen=t, table=[t], target=0.98))
    assert "ncand=128" in s and "12 ms/batch" in s
