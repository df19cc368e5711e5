"""Device-only encode MFU sweep over batch size (VERDICT r4 stretch #8).

``bench.py``'s device_mfu_stage measures one operating point (the build's
index_bsize=256 at the S=128 bucket: 58.1-58.2% MFU, round 4). This sweep
asks whether batch size is the remaining lever: it times the SAME bf16
BERT-base forward (``models.colbert.encode_batch`` — the build's dominant
device program) at B in {128, 256, 512, 1024} with all batches pre-staged
in HBM and one scalar read syncing the queued programs (the tunneled
backend's ``block_until_ready`` is a no-op — CLAUDE.md).

Usage: ``python bench_mfu.py [S]`` (default 128, the build's hot bucket).
Prints one line per B and a one-line JSON summary. Committed runs live in
SCALE.md (round 5).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from bench import (
    BERT_BASE_GFLOP_PER_TOKEN,
    BF16_PEAK_TFLOPS,
    log,
    make_bench_encoder,
)


def main() -> None:
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    total_tokens_target = 1 << 19  # ~524k tokens per measurement pass

    import jax

    encoder, _cfg = make_bench_encoder()
    if jax.default_backend() == "cpu":
        log("MFU sweep needs the TPU backend; skipping")
        return

    from colbert_tpu.models.colbert import encode_batch

    rng = np.random.default_rng(0)
    results = {}
    for B in (128, 256, 512, 1024):
        n_batches = max(2, total_tokens_target // (B * S))
        ids = rng.integers(1000, 2000, size=(B, S), dtype=np.int32)
        ids[:, 0] = 101  # [CLS]
        mask = np.ones((B, S), dtype=bool)
        keep = np.ones((B, S), dtype=bool)
        ids_d, mask_d, keep_d = encoder._put_batch(ids, mask, keep)

        def run() -> None:
            out = None
            for _ in range(n_batches):
                out = encode_batch(
                    encoder.params, ids_d, mask_d, keep_d,
                    cfg=encoder.bert_config,
                    dtype_name=encoder.config.activation_dtype,
                )
            float(out[0, 0, 0])  # sync

        run()  # warm (compile at this shape)
        best = float("inf")
        for _ in range(2):  # best-of-reps: tunnel stalls poison means
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        tokens = n_batches * B * S
        tput = tokens / best
        mfu = tput * BERT_BASE_GFLOP_PER_TOKEN / 1e3 / BF16_PEAK_TFLOPS
        results[B] = round(mfu * 100, 1)
        log(f"B={B:5d} S={S}: {tput/1e3:8.0f}k tokens/s = {mfu*100:.1f}% MFU "
            f"({n_batches} batches, best of 2)")

    print(json.dumps({"metric": "encode_mfu_sweep", "seqlen": S,
                      "unit": "% MFU by batch size", "value": results}))


if __name__ == "__main__":
    main()
