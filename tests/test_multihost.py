"""Multi-host execution path: a REAL two-process CPU cluster (gloo
collectives via ``jax.distributed``) must reproduce the single-process
sharded search and sharded k-means bit-for-bit.

The reference is single-GPU by construction (config.jl:13-14); SURVEY §2's
replacement table requires collectives over ICI/DCN under a global mesh.
``parallel.launch`` provides the process-group entry point; this test runs
it for real: the parent computes expected results on its single-process
8-device mesh, then two subprocesses (4 local devices each) join a cluster,
stream only their own shards from disk, and must agree.
"""

import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from colbert_tpu.parallel.kmeans_dist import kmeans_sharded
from colbert_tpu.parallel.mesh import make_mesh
from colbert_tpu.parallel.sharded_index import ShardedDeviceIndex
from colbert_tpu.storage import format as fmt
from colbert_tpu.utils.testing import synthesize_index

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cluster_matches_single_process(tmp_path):
    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    synthesize_index(
        idx, 256, dim=32, nbits=2, avg_doclen=12, chunksize=64,
        num_partitions=64, seed=5,
    )

    # expected results on THIS process's 8-device mesh (single-controller)
    mesh = make_mesh(8, 1)
    codec = fmt.load_codec(idx)
    doclens = np.asarray(fmt.load_all_doclens(idx), np.int64)
    sharded = ShardedDeviceIndex.build(
        mesh, centroids=codec["centroids"], stream_from=idx,
        doclens=doclens, bucket_weights=codec["bucket_weights"],
        nbits=2, balance_cap=64,
    )
    rng = np.random.default_rng(3)
    Q = rng.normal(size=(4, 8, 32)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=-1, keepdims=True)
    pids, scores = sharded.search_Q_batch(
        jnp.asarray(Q), k=5, nprobe=4, ncandidates=256,
        cell_cap=128, max_candidates=1024,
    )
    kdata = rng.normal(size=(512, 32)).astype(np.float32)
    kres = kmeans_sharded(kdata, 16, mesh, niters=4, seed=0)
    expected = str(tmp_path / "expected.npz")
    np.savez(
        expected, Q=Q, pids=pids, scores=scores,
        kmeans_data=kdata, kmeans_assignments=kres.assignments,
    )

    port = _free_port()
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["COLBERT_COORDINATOR"] = f"localhost:{port}"
        env["COLBERT_NUM_PROCESSES"] = "2"
        env["COLBERT_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, worker, idx, expected],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        # on timeout, don't leak live jax.distributed workers (they hold
        # the coordinator port and can wedge subsequent runs)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK p{pid}" in out, out[-4000:]
