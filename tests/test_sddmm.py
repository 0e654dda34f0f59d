"""SDDMM edge-score kernel tests (CPU interpret) vs scipy oracles.

Covers: scores match P ⊙ (A·Bᵀ) slot-for-slot, padding slots exactly 0,
paired/unpaired schedules, bf16/f32 modes, wide-d chunking, and the
attention-style composition scores → slotwise transform → weighted SpMM.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from mg_gcn_tpu.formats import CSRData
from mg_gcn_tpu.ops import sddmm as sd
from mg_gcn_tpu.ops import spmm_edges as se


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    for mod in (pl, se.pl, sd.pl):
        monkeypatch.setattr(mod, "pallas_call", patched)
    yield


def structure_csr(n, m=None, density=0.05, seed=0):
    m = m or n
    mat = sp.random(n, m, density=density, format="csr", random_state=seed, dtype=np.float32)
    mat.data[:] = 1.0
    return CSRData.from_scipy(mat)


def slot_oracle(mat, csr, a, b):
    """Expected per-slot scores: decode each slot word back to (row, col)
    and compare against dense A·Bᵀ (padding slots 0)."""
    idx = np.asarray(mat.idx)
    meta = np.asarray(mat.meta)
    chi = np.asarray(mat.chi)
    dense = a @ b.T
    want = np.zeros_like(idx, dtype=np.float32)
    tcw_bits = mat.tcw_bits
    for s in range(mat.num_steps):
        tr = int(meta[s]) >> (tcw_bits + 1)
        tcw = (int(meta[s]) >> 1) & ((1 << tcw_bits) - 1)
        for c in range(se.CPS):
            g = s * se.CPS + c
            v = idx[g]
            valid = (v >> 30) & 1
            pk = v & se.IDX_MASK
            # int8-mode words carry the quantized weight in bits 18..25 —
            # mask row_local exactly like the kernel does
            rl, cl = (pk >> 7) & se.RL_MASK, pk & (se.BC - 1)
            row = tr * mat.br + rl
            col = tcw * se.BCW + int(chi[s, c]) * se.BC + cl
            ok = (valid == 1) & (row < mat.n_out) & (col < mat.n_in)
            want[g] = np.where(ok, dense[np.minimum(row, mat.n_out - 1),
                                         np.minimum(col, mat.n_in - 1)], 0.0)
    return want


@pytest.mark.parametrize("paired", [False, True])
def test_sddmm_scores_match(paired):
    csr = structure_csr(400, density=0.04, seed=1)
    rng = np.random.default_rng(2)
    a = rng.standard_normal((400, 24)).astype(np.float32)
    b = rng.standard_normal((400, 24)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="float32", paired=paired)
    got = np.asarray(sd.sddmm_edge_tiles(mat, jnp.asarray(a), jnp.asarray(b)))
    want = slot_oracle(mat, csr, a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sddmm_qskip_matches_full_select():
    """The q-range row-select walk (SMEM-fed [q0, q1] per chunk) must be
    slot-identical to the full nq-loop select at a forced multi-sub-block
    br, including padding slots (empty chunks: q0 > q1, zero output)."""
    csr = structure_csr(700, density=0.02, seed=11)
    rng = np.random.default_rng(12)
    a = rng.standard_normal((700, 24)).astype(np.float32)
    b = rng.standard_normal((700, 24)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="float32", br=512)
    full = np.asarray(
        sd.sddmm_edge_tiles(mat, jnp.asarray(a), jnp.asarray(b), qskip=False)
    )
    qs = np.asarray(
        sd.sddmm_edge_tiles(mat, jnp.asarray(a), jnp.asarray(b), qskip=True)
    )
    np.testing.assert_allclose(qs, full, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(full, slot_oracle(mat, csr, a, b), rtol=1e-5, atol=1e-5)


def test_sddmm_onelevel_matches_two_level():
    """The single full-height (br, K) select must be slot-identical to the
    two-level shared-one-hot + lane-mask form (round-5 A/B variants)."""
    csr = structure_csr(700, density=0.02, seed=15)
    rng = np.random.default_rng(16)
    a = rng.standard_normal((700, 24)).astype(np.float32)
    b = rng.standard_normal((700, 24)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="float32", br=512)
    two = np.asarray(sd.sddmm_edge_tiles(mat, jnp.asarray(a), jnp.asarray(b)))
    one = np.asarray(
        sd.sddmm_edge_tiles(mat, jnp.asarray(a), jnp.asarray(b), select="one")
    )
    np.testing.assert_allclose(one, two, rtol=1e-6, atol=1e-6)


def test_sddmm_bf16():
    csr = structure_csr(300, density=0.05, seed=3)
    rng = np.random.default_rng(4)
    a = rng.standard_normal((300, 16)).astype(np.float32)
    b = rng.standard_normal((300, 16)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="bfloat16")
    got = np.asarray(sd.sddmm_edge_tiles(mat, jnp.asarray(a), jnp.asarray(b)))
    want = slot_oracle(mat, csr, a, b)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


@pytest.mark.slow
def test_sddmm_rectangular_wide_d():
    csr = structure_csr(200, 384, density=0.05, seed=5)
    rng = np.random.default_rng(6)
    a = rng.standard_normal((200, 520)).astype(np.float32)  # > 512: chunked
    b = rng.standard_normal((384, 520)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="float32")
    got = np.asarray(sd.sddmm_edge_tiles(mat, jnp.asarray(a), jnp.asarray(b)))
    want = slot_oracle(mat, csr, a, b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_attention_composition():
    """scores -> slotwise exp -> weighted SpMM == dense masked-attention
    aggregation (un-normalized)."""
    from dataclasses import replace

    n, d = 350, 12
    csr = structure_csr(n, density=0.05, seed=7)
    rng = np.random.default_rng(8)
    a = rng.standard_normal((n, d)).astype(np.float32) * 0.3
    h = rng.standard_normal((n, d)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="float32")
    scores = sd.sddmm_edge_tiles(mat, jnp.asarray(a), jnp.asarray(a))
    # slotwise transform; padding slots must stay 0 weight
    valid = (np.asarray(mat.idx) >> 30) & 1
    alpha = jnp.exp(scores) * jnp.asarray(valid.astype(np.float32))
    out = np.asarray(
        se.spmm_edge_tiles(replace(mat, w=alpha), jnp.asarray(h))
    )
    pat = csr.to_dense()
    dense_alpha = np.exp((a @ a.T).astype(np.float32)) * pat
    np.testing.assert_allclose(out, dense_alpha @ h, rtol=1e-4, atol=1e-4)


def test_sddmm_int8_mode():
    """int8-mode mats run the 2x MXU path with per-feature dequant; error
    budget = 8-bit operand rounding (~1% relative of the score scale)."""
    csr = structure_csr(320, density=0.05, seed=9)
    rng = np.random.default_rng(10)
    a = rng.standard_normal((320, 32)).astype(np.float32)
    b = rng.standard_normal((320, 32)).astype(np.float32)
    mat = se.edge_tile_mat_from_csr(csr, dtype="int8")
    got = np.asarray(sd.sddmm_edge_tiles(mat, jnp.asarray(a), jnp.asarray(b)))
    want = slot_oracle(mat, csr, a, b)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.03 * scale)
    # padding slots exactly 0 even in int8 mode
    valid = (np.asarray(mat.idx) >> 30) & 1
    assert np.all(got[valid == 0] == 0.0)
