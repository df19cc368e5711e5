"""Worker for tests/test_multihost.py: one process of a two-process CPU
cluster (4 local devices each -> 8 global). Builds the sharded index by
streaming ONLY its own shards' rows from disk, runs a sharded search and a
sharded k-means fit over the global mesh, and checks both against the
expected results the parent computed single-process. Not a pytest module
(underscore prefix keeps it out of collection)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    idx_path, expected_npz = sys.argv[1], sys.argv[2]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from colbert_tpu.parallel import launch

    launch.initialize()  # COLBERT_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp
    import numpy as np

    from colbert_tpu.parallel.kmeans_dist import kmeans_sharded
    from colbert_tpu.parallel.mesh import make_mesh
    from colbert_tpu.parallel.sharded_index import ShardedDeviceIndex
    from colbert_tpu.storage import format as fmt

    exp = np.load(expected_npz)
    mesh = make_mesh(8, 1)

    # --- sharded serving: per-host streaming build + all_gather merge ---
    codec = fmt.load_codec(idx_path)
    doclens = np.asarray(fmt.load_all_doclens(idx_path), np.int64)
    sharded = ShardedDeviceIndex.build(
        mesh,
        centroids=codec["centroids"],
        stream_from=idx_path,
        doclens=doclens,
        bucket_weights=codec["bucket_weights"],
        nbits=2,
        balance_cap=64,
    )
    pids, scores = sharded.search_Q_batch(
        jnp.asarray(exp["Q"]), k=5, nprobe=4, ncandidates=256,
        cell_cap=128, max_candidates=1024,
    )
    np.testing.assert_array_equal(pids, exp["pids"])
    np.testing.assert_allclose(scores, exp["scores"], rtol=1e-4, atol=1e-4)

    # --- sharded k-means over the two-process mesh ---
    data = exp["kmeans_data"]
    res = kmeans_sharded(data, 16, mesh, niters=4, seed=0)
    np.testing.assert_array_equal(res.assignments, exp["kmeans_assignments"])

    print(f"MULTIHOST_OK p{jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
