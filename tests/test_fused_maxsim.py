"""Pallas fused decompress+MaxSim kernel parity vs the XLA decompress path
(interpret mode on CPU; the hardware path is exercised on the real chip by
bench.py and the searcher drive)."""

import jax.numpy as jnp
import numpy as np
import pytest

from colbert_tpu.ops import codec as codec_ops
from colbert_tpu.ops.fused_maxsim import pallas_stage2_supported, stage2_maxsim_pallas


@pytest.mark.parametrize("nbits", [1, 2, 4])
def test_kernel_matches_decompress_maxsim(rng, nbits):
    k, dim = 64, 128
    NC, Ld, Lq = 128, 16, 8
    nbytes = dim // 8 * nbits
    cent = rng.standard_normal((k, dim)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    bw = np.sort(rng.standard_normal(1 << nbits)).astype(np.float32) * 0.05
    codes = rng.integers(0, k, (NC, Ld)).astype(np.int32)
    packed = rng.integers(0, 256, (NC, Ld, nbytes)).astype(np.uint8)
    dl = rng.integers(0, Ld + 1, (NC,))
    valid = np.arange(Ld)[None, :] < dl[:, None]
    Q = rng.standard_normal((Lq, dim)).astype(np.float32)

    centd, bwd = jnp.asarray(cent), jnp.asarray(bw)
    codesd, packedd = jnp.asarray(codes), jnp.asarray(packed)
    validd, Qd = jnp.asarray(valid), jnp.asarray(Q)

    embs = codec_ops.decompress(
        codesd.reshape(-1), packedd.reshape(-1, nbytes), centd, bwd, nbits=nbits
    ).reshape(NC, Ld, dim)
    s = jnp.einsum("qd,pld->qpl", Qd, embs, preferred_element_type=jnp.float32)
    s = jnp.where(validd[None], s, -1e30)
    want = np.asarray(jnp.max(s, axis=-1))  # (Lq, NC)

    got = np.asarray(stage2_maxsim_pallas(
        Qd, centd[codesd], packedd, validd, bwd, nbits=nbits,
        bc=128, ldb=8, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # uint32-lane packed input (the flat device residual layout): identical
    # results when the words are little-endian views of the same byte rows
    packed32 = jnp.asarray(
        np.ascontiguousarray(packed).reshape(NC, Ld, -1).view(np.uint32)
    )
    got32 = np.asarray(stage2_maxsim_pallas(
        Qd, centd[codesd], packed32, validd, bwd, nbits=nbits,
        bc=128, ldb=8, interpret=True,
    ))
    np.testing.assert_allclose(got32, want, rtol=1e-4, atol=1e-4)


def test_supported_gate():
    assert not pallas_stage2_supported(8, 128, backend="tpu")   # nbits=8: no
    assert not pallas_stage2_supported(2, 64, backend="tpu")    # dim: no
    assert not pallas_stage2_supported(2, 128, backend="cpu")   # cpu: no
    assert pallas_stage2_supported(2, 128, backend="tpu")
