"""ColBERT configuration.

TPU-native analogue of the reference's single ``ColBERTConfig`` kwdef struct
(reference: src/infra/config.jl:54-90). Same capability contract — run /
tokenization / resource / doc / query / indexing / search settings with the
same defaults — plus TPU-specific knobs (mesh shape, dtypes, pallas toggles)
the single-GPU reference does not have.

Unlike the reference's JSON loader (src/loaders.jl:66-74, which ``eval``s
kwargs — a wart we deliberately do not copy), (de)serialization here is a
plain dataclass <-> dict mapping with unknown-key tolerance for forward
compatibility.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ColBERTConfig:
    # -- run settings (reference config.jl:57-63) --
    # parity-only (reference config.jl:13-14 "only supports one GPU"): the
    # TPU build never reads it — device selection is JAX_PLATFORMS / the
    # ambient jax backend, and multi-device runs attach a Mesh instead
    use_gpu: bool = True
    rank: int = 0
    nranks: int = 1

    # -- tokenization settings (reference config.jl:64-70) --
    query_token_id: str = "[unused0]"
    doc_token_id: str = "[unused1]"
    query_token: str = "[Q]"
    doc_token: str = "[D]"

    # -- resource settings (reference config.jl:71-76) --
    checkpoint: str = "colbert-ir/colbertv2.0"
    collection: str = ""
    index_path: str = ""

    # -- doc settings (reference config.jl:72) --
    dim: int = 128
    doc_maxlen: int = 300
    mask_punctuation: bool = True

    # -- query settings (reference config.jl:76-78) --
    query_maxlen: int = 32
    attend_to_mask_tokens: bool = False

    # -- indexing settings (reference config.jl:79-87) --
    index_bsize: int = 64
    chunksize: int | None = None
    passages_batch_size: int = 5000
    nbits: int = 2
    kmeans_niters: int = 20
    # IVF partition count. None = the reference's planner formula
    # (2^floor(log2(16*sqrt(est_embeddings))), collection_indexer.jl:115-139).
    # A TPU serving knob the reference doesn't expose: stage-1 cost per
    # query is nprobe_eff * cell_cap entries, and cell sizes scale with
    # N/partitions — on corpora whose hot cells split 4-way (probe-dup
    # compensation then probes nprobe+3 slots), 2-4x more partitions
    # shrinks cells, splits, and the per-query entry budget at the price of
    # a proportionally longer k-means (codec quality improves, finer
    # quantization). Clamped to the training-sample size.
    num_partitions: int | None = None

    # -- search settings (reference config.jl:88-89) --
    nprobe: int = 2
    ncandidates: int = 8192

    # -- TPU-native settings (no reference equivalent) --
    # dtype used for encoder activations; params are kept fp32 and cast in.
    activation_dtype: str = "bfloat16"
    # dtype of encode_passages outputs on the device->host wire. The D2H
    # link is the encode bottleneck (tunneled chip: ~30 MB/s), so fp32
    # embeddings would dominate the pipeline; bf16 halves the bytes and its
    # rounding (~1/256 of unit-norm values) sits far below the residual
    # codec's own bucket granularity. Set "float32" for bit-exact outputs.
    # (The fused index-build path ships compressed artifacts and never pays
    # this; query encodes stay fp32 — they are tiny.) "int8" quantizes the
    # unit-norm embeddings to round(x*127) on device and dequantizes on the
    # host: same error order as bf16 (step 1/127 vs bf16's ~1/256 relative)
    # at half bf16's bytes again.
    transfer_dtype: str = "bfloat16"
    # mesh axis sizes; data axis shards batches/collection, model axis reserved
    # for tensor parallelism of the encoder (dense/attention head sharding).
    mesh_data_axis: int = -1  # -1 => all available devices
    mesh_model_axis: int = 1
    # use the pallas fused kernels on TPU (auto-disabled on cpu backend)
    use_pallas: bool = True
    # minimum padded sequence length at which the encoder routes attention
    # through the pallas flash kernel (requires seqlen % 128 == 0).
    # Measured on v5e, device-program-only (bench.py flash stage): XLA's
    # fused attention BEATS the hand-written online-softmax kernel at every
    # sequence length a BERT backbone can reach — 0.71x at S=512, 0.65x at
    # S=1024 — so the default routes everything to XLA. The kernel stays
    # wired + correctness-tested; lower this only after measuring a win on
    # your chip/backbone.
    flash_min_seqlen: int = 2048
    # length bucketing for doc encoding: pad each batch up to the next multiple
    # of this, bounded by doc_maxlen, to limit recompilation while avoiding
    # always padding to doc_maxlen.
    length_bucket: int = 64
    # staged PLAID-style pruning: number of candidate passages kept after the
    # approximate (centroid-only) scoring stage. The reference defines
    # `ncandidates` but never uses it (SURVEY §3.4); here it is meaningful.
    use_plaid_pruning: bool = True
    # probed IVF cells with centroid score below this generate no candidates
    # (each query token's best cell is always kept); None disables cell
    # pruning. PLAID's default operating point is 0.45 (PAPERS.md).
    centroid_score_threshold: float | None = 0.45
    # candidates that survive stage-1 (centroid-only scoring) into the full
    # decompress+MaxSim stage-2. None = max(16*k, 1024), PLAID's operating
    # point; stage-2 is the gather-bandwidth-bound stage, so this is THE
    # latency/recall dial. Ignored when use_plaid_pruning is off (everything
    # is fully scored).
    # Measured (bench.py funnel-recall stage, 4096-passage tie-heavy
    # synthetic corpus — an adversarial case for centroid-level pruning,
    # since near-tied passages are interchangeable at stage-1 granularity):
    # score-recall@10 vs exhaustive is ~0.95 at ncandidates=2048, ~0.92 at
    # 1600 (the k=100 default), ~0.78 at 512, ~0.35 at 128. Regimes below
    # ~1024 trade visible recall for stage-2 time; trained checkpoints
    # (structured embedding space) sit well above these floors.
    plaid_stage2_docs: int | None = None
    # hybrid stage-1: rank all candidates with the cheap gather-free probed
    # bound, then re-rank a 4x-wide cut with the full centroid interaction
    # before the stage-2 budget. The probed bound alone cannot separate
    # near-duplicate candidates (same cells -> tied scores); the refine
    # restores funnel precision at ~1/4 the old gather cost.
    # Measured QPS/recall frontier (B=64, 4k tie-heavy corpus, v5e;
    # score-recall@10 vs exhaustive):
    #   (ncand= 512, refine, dupcomp): 46 QPS, 0.78
    #   (ncand=1024, refine, dupcomp): 42 QPS, 0.89
    #   (ncand=2048=full width, NO refine, no dupcomp): 55 QPS, 0.92
    #   (ncand=2048=full width, NO refine, dupcomp):   47 QPS, 0.93
    # i.e. the refine earns its ~7ms/query only when ncandidates is well
    # below the dedup width; at ncandidates >= max_candidates it cannot
    # change the scored set and costs nothing (short-circuited). On small
    # corpora, widening plaid_stage2_docs to search_max_candidates beats
    # refining a narrower cut on BOTH axes.
    # Round-4, 141k TRAINED encoder (bench_quality.py, SCALE.md): refine on
    # and "refine off + nprobe+2" tie at set-recall@10 0.997; refine wins
    # at depth (@100: 0.993 vs 0.983) and both cost ~the same ms/batch
    # after the round-4 row-gather refine — keep refine for depth, or trade
    # it for +2 probes when only @10 matters.
    plaid_stage1_refine: bool = True
    # width of the stage-1 refine window, as a multiple of the stage-2
    # budget: the refine re-ranks min(refine_width_factor * ncandidates,
    # search_max_candidates) candidates with the full centroid interaction.
    # The refine is the largest single term of the quality-first serving
    # budget at scale (its cost is ~linear in this factor: it gathers
    # width * max_doclen centroid rows per query), so on corpora whose
    # stage-1 bound already orders candidates well, 2 buys most of 4's
    # recall at ~half the refine cost — a per-corpus dial the autotuner
    # sweeps (evaluation.autotune).
    refine_width_factor: int = 4
    # device-search capacity knobs (static shapes of the jitted search
    # program). None = auto-size from the index: cell_cap from the largest
    # IVF cell, max_candidates from the passage count — exact but memory-
    # hungry on big indexes; set explicitly to trade recall for speed.
    # Candidate-set truncation is score-ordered and overflow is counted
    # (DeviceIndex.overflow_candidates) and logged.
    search_cell_cap: int | None = None
    search_max_candidates: int | None = None
    # balanced IVF: cells larger than this split into sub-cells with
    # duplicated probe centroids, bounding the static per-probe entry budget
    # (oversized cells cost extra probe slots, truncated beyond 4 sub-cells).
    # None = 1024. Set 0 to disable splitting.
    # The cap is also the dominant stage-1 cost term (per-query work scales
    # with nprobe * cell_cap) and is CORPUS-DEPENDENT — measured on v5e:
    # on a 4k corpus whose mega-cells are redundant near-duplicates,
    # cap 1024 -> 128 DOUBLED tuned QPS (95 -> 194) while recall rose
    # (0.93 -> 0.96); on a 141k corpus where mega-cells carry real mass the
    # same change cratered recall (0.54 -> 0.29) for little QPS. Tune per
    # corpus with bench.py's recall stage; 1024 is the safe default.
    ivf_balance_cap: int | None = None
    # add up to (probe_dup_max - 1) probe slots so split cells' duplicates
    # don't crowd out distinct cells (recall-preserving, costs entry budget
    # ~= the unbalanced index). The compensation scales with the fraction
    # of the corpus living in split cells (device_index.probe_compensation):
    # an index where one stray cell split pays ~nothing, one whose hot
    # cells all split pays the full worst case. False probes exactly nprobe
    # slots: faster, but a query token whose best cell was split may probe
    # ONLY that cell.
    probe_dup_compensation: bool = True
    # split-cell mass fraction at which the probe-dup compensation saturates
    # to the full worst case (dup_max - 1 extra probes); below it the extra
    # probes scale linearly with the mass. Measured knees: 141k random-weight
    # corpus at 131072 partitions (1.2% split mass, mostly 2-way splits) —
    # recall flat across nprobe 2..5 while QPS falls 21%, so 1 extra probe
    # suffices; 141k TRAINED at planner partitions (26.5% mass, dup_max=4,
    # round 5) — score@10 knee ALSO at 1 extra probe, the formula's full
    # extra=3 buys only +0.002 @100 for ~11% QPS. Above the knee this knob
    # trades depth@100 for QPS; the default stays recall-maximal (the
    # audited quality-first point). Raise ``saturate`` (or let the
    # autotuner pick an operating point) to recover the QPS per corpus.
    # See device_index.probe_compensation.
    probe_comp_saturation: float = 0.05

    def __post_init__(self) -> None:
        if self.dim % 8 != 0:
            raise ValueError("dim must be a multiple of 8 (bit-packed residuals)")
        if not (0 <= self.rank < max(1, self.nranks)):
            raise ValueError("rank must satisfy 0 <= rank < nranks")
        if self.nbits not in (1, 2, 4, 8):
            raise ValueError("nbits must be one of 1, 2, 4, 8")
        if self.query_maxlen < 3:
            raise ValueError("query_maxlen must be >= 3 ([CLS] [Q] + content)")
        if self.doc_maxlen < 3:
            raise ValueError("doc_maxlen must be >= 3 ([CLS] [D] + content)")
        if self.transfer_dtype not in ("bfloat16", "float16", "float32", "int8"):
            raise ValueError(
                "transfer_dtype must be bfloat16, float16, float32 or int8"
            )

    # -- (de)serialization: plain JSON, field-name keyed --

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ColBERTConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def save(self, path: str) -> None:
        """Write config.json (reference: src/savers.jl:110-121)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "ColBERTConfig":
        """Read config.json (reference: src/loaders.jl:66-74, minus the eval)."""
        with open(path) as f:
            return cls.from_dict(json.load(f))
