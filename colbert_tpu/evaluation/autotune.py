"""Operating-point auto-tuner for the serving funnel.

The reference has no pruning and therefore no knobs: every probed
candidate is fully scored (reference: src/searching.jl:93-128, and
config.jl:89's ``ncandidates`` is never read). The TPU build's staged
funnel (probe -> stage-1 bound -> optional full-centroid refine ->
stage-2 decompress+MaxSim) buys its ~20x serving speedup with three
quality knobs — ``nprobe``, ``plaid_stage2_docs`` (the stage-2 doc
budget), ``plaid_stage1_refine`` — whose right setting is corpus-dependent
(SCALE.md measures opposite optima for 4k/141k/1M corpora).

This module maps the knobs automatically: score a query sample exactly
(:mod:`.oracle`), sweep a small grid of operating points through the real
device program, and return the cheapest point whose tie-aware
score-recall@k meets the target. "Cheapest" is measured batch time on the
live backend when ``time_reps > 0``, else (and for ties) an analytic cost
in funnel row-reads calibrated against the measured per-stage timings in
SCALE.md's 1M profile.

Typical offline use (one-time per corpus, ~5s compile per grid point)::

    result = tune_operating_point(searcher, queries, k=10,
                                  target_score_recall=0.98)
    result.apply(searcher)          # sets the config knobs in place
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field

import numpy as np

from colbert_tpu.evaluation.metrics import score_recall_at_k, set_recall_at_k
from colbert_tpu.evaluation.oracle import exhaustive_scores, oracle_topk

logger = logging.getLogger(__name__)

__all__ = ["OperatingPoint", "TunedPoint", "TuneResult", "tune_operating_point"]

# Analytic per-unit weights, calibrated on the measured v5e 1M profile
# (SCALE.md: stage-1 sort 182 ms / 10.5M entries, refine 540 ms / 41.9M
# token rows, stage-2 470 ms / 10.5M token rows per B=64 batch). Relative
# only — used to rank points, never to predict wall time.
_W_STAGE1_ENTRY = 1.0
_W_REFINE_ROW = 0.75
_W_STAGE2_ROW = 2.6


@dataclass(frozen=True)
class OperatingPoint:
    """One funnel knob setting, relative to the searcher's config."""

    nprobe_delta: int = 0      # added on top of the compensated nprobe
    ncandidates: int = 1024    # stage-2 doc budget (config.plaid_stage2_docs)
    stage1_refine: bool = True

    def label(self) -> str:
        parts = [f"ncand={self.ncandidates}",
                 "refine" if self.stage1_refine else "no-refine"]
        if self.nprobe_delta:
            parts.append(f"nprobe+{self.nprobe_delta}")
        return ", ".join(parts)

    def cost(self, *, nprobe: int, lq: int, cell_cap: int, max_doclen: int,
             max_candidates: int) -> float:
        """Analytic funnel work (relative units; see module docstring)."""
        entries = (nprobe + self.nprobe_delta) * lq * cell_cap
        refine_rows = (
            min(4 * self.ncandidates, max_candidates) * max_doclen
            if self.stage1_refine else 0
        )
        stage2_rows = self.ncandidates * max_doclen
        return (_W_STAGE1_ENTRY * entries + _W_REFINE_ROW * refine_rows
                + _W_STAGE2_ROW * stage2_rows)


_DEFAULT_GRID = (
    OperatingPoint(0, 128, stage1_refine=True),
    OperatingPoint(0, 512, stage1_refine=False),
    OperatingPoint(0, 512, stage1_refine=True),
    OperatingPoint(0, 1024, stage1_refine=False),
    OperatingPoint(2, 1024, stage1_refine=False),
    OperatingPoint(0, 1024, stage1_refine=True),
    OperatingPoint(0, 4096, stage1_refine=True),
)


@dataclass
class TunedPoint:
    point: OperatingPoint
    score_recall: float
    set_recall: float
    cost: float
    ms_per_batch: float | None = None


@dataclass
class TuneResult:
    chosen: TunedPoint
    table: list[TunedPoint] = field(default_factory=list)
    target: float = 0.0
    met_target: bool = True

    def apply(self, searcher) -> None:
        """Write the chosen point's knobs into ``searcher.config``."""
        p = self.chosen.point
        searcher.config.plaid_stage2_docs = p.ncandidates
        searcher.config.plaid_stage1_refine = p.stage1_refine
        searcher.config.nprobe = searcher.config.nprobe + p.nprobe_delta

    def __str__(self) -> str:
        lines = [
            f"  [{'*' if t is self.chosen else ' '}] {t.point.label():<34} "
            f"score-recall@k {t.score_recall:.3f}  set {t.set_recall:.3f}"
            + (f"  {t.ms_per_batch:.0f} ms/batch" if t.ms_per_batch else "")
            for t in self.table
        ]
        head = (f"tuned operating points (target score-recall "
                f"{self.target:.2f}{'' if self.met_target else ' — UNMET'}):")
        return "\n".join([head] + lines)


def tune_operating_point(
    searcher,
    queries=None,
    *,
    Q=None,
    k: int = 10,
    target_score_recall: float = 0.98,
    grid: tuple[OperatingPoint, ...] = _DEFAULT_GRID,
    time_reps: int = 2,
    tie_eps: float = 0.01,
) -> TuneResult:
    """Sweep ``grid`` against the exact oracle and pick the cheapest point
    with score-recall@k >= ``target_score_recall``.

    ``queries`` are sample query strings (encoded with the searcher's
    encoder); pass pre-encoded ``Q`` (B, Lq, dim) instead to skip encoding.
    ``time_reps=0`` ranks by the analytic cost only (deterministic; used
    by the CPU tests); otherwise by measured batch time. If no point meets
    the target, the highest-recall point is chosen and ``met_target`` is
    False (a warning is logged).

    Single-process backends only (the oracle reads the chunk mmaps).
    """
    import jax.numpy as jnp

    if Q is None:
        if queries is None:
            raise ValueError("pass queries (strings) or Q (embeddings)")
        Q = jnp.asarray(searcher.encoder.encode_queries(list(queries)))
    else:
        Q = jnp.asarray(Q)

    oscores = exhaustive_scores(searcher, Q)
    otop = oracle_topk(oscores, k)

    cfg = searcher.config
    nprobe = cfg.nprobe
    if cfg.probe_dup_compensation:
        nprobe = searcher.device_index.compensated_nprobe(nprobe)
    lq = int(Q.shape[1])
    max_doclen = searcher.device_index.max_doclen
    cost_kw = dict(nprobe=nprobe, lq=lq, cell_cap=searcher.cell_cap,
                   max_doclen=max_doclen,
                   max_candidates=searcher.max_candidates)
    search_kw = dict(k=k, cell_cap=searcher.cell_cap,
                     max_candidates=searcher.max_candidates,
                     centroid_threshold=cfg.centroid_score_threshold,
                     use_pallas=searcher._stage2_pallas)

    table: list[TunedPoint] = []
    for p in grid:
        nc = min(p.ncandidates, searcher.max_candidates)
        pids, _ = searcher.device_index.search_Q_batch(
            Q, nprobe=nprobe + p.nprobe_delta, ncandidates=nc,
            stage1_refine=p.stage1_refine, **search_kw,
        )
        pids = np.asarray(pids)
        ms = None
        if time_reps > 0:
            # best-of-reps: the tunneled link stalls unpredictably and one
            # stalled rep under a mean mis-ranks the point (bench.py
            # _time_qps has the measured example)
            best = float("inf")
            for _ in range(time_reps):
                t0 = time.time()
                out = searcher.device_index.search_Q_batch(
                    Q, nprobe=nprobe + p.nprobe_delta, ncandidates=nc,
                    stage1_refine=p.stage1_refine, **search_kw,
                )
                float(np.asarray(out[1])[0, 0])  # force sync (tunnel)
                best = min(best, time.time() - t0)
            ms = best * 1e3
        table.append(TunedPoint(
            point=p,
            score_recall=score_recall_at_k(pids, oscores, k, eps=tie_eps),
            set_recall=set_recall_at_k(pids, otop, k),
            cost=p.cost(**cost_kw),
            ms_per_batch=ms,
        ))

    def rank_key(t: TunedPoint):
        # measured time when available; analytic cost breaks ties and is
        # the sole key at time_reps=0
        return (t.ms_per_batch if t.ms_per_batch is not None else 0.0, t.cost)

    qualifying = [t for t in table if t.score_recall >= target_score_recall]
    met = bool(qualifying)
    if met:
        chosen = min(qualifying, key=rank_key)
    else:
        # cheapest among the highest-recall points (max keeps the FIRST
        # maximal element of the cost-sorted table)
        chosen = max(sorted(table, key=rank_key),
                     key=lambda t: t.score_recall)
        logger.warning(
            "no operating point reaches score-recall %.3f (best %.3f: %s) — "
            "widen the grid or raise search_max_candidates",
            target_score_recall, chosen.score_recall, chosen.point.label(),
        )
    return TuneResult(chosen=chosen, table=table,
                      target=target_score_recall, met_target=met)
