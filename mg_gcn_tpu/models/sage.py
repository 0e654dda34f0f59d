"""GraphSAGE (mean aggregator) — BASELINE.md config 4.

A capability extension over the reference (which only ships GCN): each layer
computes ``h' = act(h·W_self + mean_neighbors(h)·W_neigh + b)``, with the
mean aggregation expressed as SpMM with the *row*-normalized adjacency
(normalize(false) in reference terms, matrix.hpp:341-349).

For binary adjacencies the aggregation uses the same bit-packed pattern
kernel as GCN: row-normalized M = diag(r)·P means M·B = r ⊙ (P·B)
(orientation "P", post-scale) and Mᵀ·G = Pᵀ·(r ⊙ G) (orientation "PT",
pre-scale) — one shared packed pattern.

Training uses exact autodiff gradients (there is no reference backward to
mirror for this model).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import sparse as host_sparse
from ..formats import CSRData
from ..nn import init as init_lib
from ..ops import elementwise as ew
from ..ops.softmax_xent import softmax_xent
from ..ops.spmm import AggPair, COOMat, aggregate


@dataclass(frozen=True)
class SAGEConfig:
    sizes: tuple[int, ...]
    leaky_slope: float = 0.01
    loss_mask: str = "all"
    # Per-node l2 normalization of every hidden layer's output — the
    # GraphSAGE paper's Algorithm 1 line 7 (h = h/||h||_2). Without it the
    # raw self-path (h·W_self on unstandardized features) saturates the
    # softmax at hidden 512: the r3 bench recorded loss_first 50.1 and a
    # barely-learning 0.06 accuracy (VERDICT r3 weak #5). Row-local, so the
    # distributed twin needs no extra collective.
    l2_normalize: bool = True

    @property
    def num_layers(self) -> int:
        return len(self.sizes) - 1


def l2_norm_rows(h: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Per-node l2 normalization (GraphSAGE Alg. 1 line 7)."""
    return h * jax.lax.rsqrt(jnp.sum(h * h, axis=-1, keepdims=True) + eps)


def build_sage_pair(
    graph: CSRData, impl: str = "auto", pack=None, dtype: str = "bfloat16"
) -> AggPair:
    """(M, Mᵀ) pair for mean aggregation, M = row-normalized adjacency.

    ``pack`` optionally reuses an already-built bit-packed pattern of the
    same graph (e.g. from a GCN PatternMat) — only the scale differs.
    ``dtype`` is the pattern MXU dtype (bfloat16 / float32 / int8).
    """
    from ..ops import spmm_pattern

    if impl not in ("auto", "pattern", "edge", "gather", "xla"):
        raise ValueError(
            f"SAGE aggregation impl {impl!r} not available; use auto, "
            "pattern, edge, gather or xla"
        )
    if impl == "auto":
        import jax as _jax

        if pack is not None or spmm_pattern.pattern_feasible(graph):
            impl = "pattern"
        elif _jax.default_backend() in ("tpu", "axon"):
            # weighted / oversized graphs: edge-tile, or serial-gather in
            # the ultra-sparse regime (train._edge_or_gather's crossover)
            from ..train import _edge_or_gather

            impl = _edge_or_gather(graph)
        else:
            impl = "xla"
    if impl == "pattern":
        if not spmm_pattern.is_binary(graph):
            raise ValueError("pattern SpMM needs a binary adjacency (data == 1)")
        n = graph.nrows
        n_pad = spmm_pattern.round_up(n, spmm_pattern.N_ALIGN)
        if pack is None:
            pack = spmm_pattern.pack_bits_on_device(graph, n_pad)
        scale = jnp.asarray(spmm_pattern.row_scale(graph, n_pad))
        fwd = spmm_pattern.PatternMat(
            pack, scale, n, n_pad, graph.nnz, "P", "post", dtype
        )
        bwd = spmm_pattern.PatternMat(
            pack, scale, n, n_pad, graph.nnz, "PT", "pre", dtype
        )
        return AggPair(fwd=fwd, bwd=bwd)
    m = host_sparse.normalize(graph, axis=False)
    m_t = host_sparse.transpose(m)
    if impl == "gather":
        from ..ops.spmm_gather import gather_pair_from_csr_pair

        fwd, bwd = gather_pair_from_csr_pair(m, m_t)
        return AggPair(fwd=fwd, bwd=bwd)
    if impl == "edge":
        from ..ops.spmm_edges import edge_pair_from_csr_pair

        try:
            fwd, bwd = edge_pair_from_csr_pair(
                m, m_t, dtype="bfloat16" if dtype == "int8" else dtype
            )
            return AggPair(fwd=fwd, bwd=bwd)
        except ValueError as exc:
            # schedule too large for single-chip SMEM; COO below — warn so
            # the degradation is visible in logs/bench output
            import sys

            print(
                f"edge-tile schedule infeasible ({exc}); falling back to "
                "the COO/XLA engine",
                file=sys.stderr,
            )
    return AggPair(fwd=COOMat.from_csr(m), bwd=COOMat.from_csr(m_t))


def init_params(config: SAGEConfig, key: jax.Array | None = None) -> list[dict]:
    params = []
    for i in range(config.num_layers):
        in_, out = config.sizes[i], config.sizes[i + 1]
        if key is None:
            layer = dict(
                Wself=jnp.asarray(init_lib.kaiming_uniform_ref(in_, out)),
                Wneigh=jnp.asarray(init_lib.kaiming_uniform_ref(in_, out)),
                b=jnp.asarray(init_lib.bias_ref(out)),
            )
        else:
            key, k1, k2, k3 = jax.random.split(key, 4)
            layer = dict(
                Wself=init_lib.kaiming_uniform(k1, in_, out),
                Wneigh=init_lib.kaiming_uniform(k2, in_, out),
                b=init_lib.bias_uniform(k3, out),
            )
        params.append(layer)
    return params


def forward(params: Sequence[dict], pair: AggPair, x: jax.Array, config: SAGEConfig):
    h = x
    for i, layer in enumerate(params):
        neigh = aggregate(pair, h)
        h = h @ layer["Wself"] + neigh @ layer["Wneigh"] + layer["b"]
        if i + 1 < config.num_layers:
            h = ew.leaky_relu(h, config.leaky_slope)
            if config.l2_normalize:
                h = l2_norm_rows(h)
    return h


def loss_fn(params, pair, x, y, config: SAGEConfig, mask=None):
    logits = forward(params, pair, x, config)
    out = softmax_xent(logits, y, mask)
    return out.loss, out.acc


def loss_and_grad(params, pair, x, y, config: SAGEConfig, mask=None):
    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, pair, x, y, config, mask
    )
    return loss, acc, grads
