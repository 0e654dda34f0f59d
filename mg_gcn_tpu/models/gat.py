"""Graph Attention Network (GAT) — an attention model family on the
edge-tile SpMM/SDDMM machinery.

A capability extension over the reference (which is attention-free; its op
inventory stops at cuSPARSE SpMM, cuda_utils.hpp:27-102). Each layer, per
head::

    z      = h · W                                  (dense MXU GEMM)
    s_e    = leaky_relu(a_dst·z[r_e] + a_src·z[c_e])   (d=2 SDDMM)
    alpha  = softmax over each row's edges             (slot softmax)
    h'_r   = Σ_e alpha_e · z[c_e]                      (weighted SpMM)

Heads concatenate on hidden layers and average on the output layer
(Velickovic et al., arXiv:1710.10903 semantics). Every sparse step runs in
the shared edge-tile slot layout — the SDDMM emits scores exactly where the
weighted SpMM consumes them — so a full training step does zero gathers or
scatters (see ops/edge_attention.py for the custom-VJP gradient algebra).
Training is exact autodiff (no reference backward exists to mirror).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import CSRData
from ..nn import init as init_lib
from ..ops import elementwise as ew
from ..ops.edge_attention import build_attention_graph, sddmm, slot_softmax, spmm_attn
from ..ops.softmax_xent import softmax_xent


@dataclass(frozen=True)
class GATConfig:
    sizes: tuple[int, ...]  # per-head widths: (in, h1, ..., out)
    heads: int = 1
    att_slope: float = 0.2  # LeakyReLU slope on attention scores
    leaky_slope: float = 0.01  # inter-layer activation (framework vocabulary)
    loss_mask: str = "all"
    # weight the attention by the graph's (positive) edge values:
    # alpha_e ∝ w_e · exp(s_e), i.e. a log-weight bias on the scores
    edge_weighted: bool = False

    @property
    def num_layers(self) -> int:
        return len(self.sizes) - 1

    def layer_in(self, i: int) -> int:
        # hidden layers concatenate the previous layer's heads
        return self.sizes[i] * (self.heads if i > 0 else 1)


def build_gat_graph(graph: CSRData, dtype: str = "bfloat16"):
    """(EdgeTileMat, TSched) over the adjacency. The structure drives the
    attention; the stored edge values are only read when
    ``config.edge_weighted`` (they must then be positive — the bias is
    ``log w``). Self-loops should be present so every node attends at
    least to itself (prep adds them)."""
    return build_attention_graph(graph, dtype=dtype)


def _log_weight_bias(mat) -> jax.Array:
    """Per-slot ``log w_e`` (0 on padding): the edge-weighted attention
    bias — ``softmax(s + log w)`` ≡ ``w·exp(s)`` renormalized.

    Clamped to ±30: an unbounded bias (e.g. w = 1e-30 → −69) widens the
    score range past slot_softmax's per-row stabilization window and
    silently zeroes whole attention rows; at ±30 a weight ratio of e⁶⁰
    (≈ 1e26) within one row is still represented exactly, far beyond any
    meaningful edge weighting."""
    from ..ops.edge_attention import valid_mask

    w = mat.w.astype(jnp.float32)
    bias = jnp.clip(jnp.log(jnp.maximum(w, 1e-30)), -30.0, 30.0)
    return jnp.where(valid_mask(mat) > 0, bias, 0.0)


def init_params(config: GATConfig, key: jax.Array | None = None) -> list[dict]:
    """Per layer: W (in, heads·out), attention vectors a_dst/a_src
    (heads, out), bias (heads·out or out on the averaged last layer)."""
    params = []
    H = config.heads
    for i in range(config.num_layers):
        in_, out = config.layer_in(i), config.sizes[i + 1]
        b_width = out * (H if i + 1 < config.num_layers else 1)
        if key is None:
            w = np.concatenate(
                [init_lib.kaiming_uniform_ref(in_, out) for _ in range(H)], axis=1
            )
            a = init_lib.kaiming_uniform_ref(out, 2 * H)  # columns: per-head pairs
            layer = dict(
                W=jnp.asarray(w),
                a_dst=jnp.asarray(a[:, :H].T.copy()),
                a_src=jnp.asarray(a[:, H:].T.copy()),
                b=jnp.asarray(np.zeros(b_width, np.float32)),
            )
        else:
            key, k1, k2, k3 = jax.random.split(key, 4)
            layer = dict(
                W=init_lib.kaiming_uniform(k1, in_, H * out),
                # attention vectors scale with the head width (fan_in=out):
                # a fan_in=H bound (~1.2) makes |scores| ~ 20 and saturates
                # the edge softmax into vanishing gradients
                a_dst=init_lib.kaiming_uniform(k2, out, H).T,
                a_src=init_lib.kaiming_uniform(k3, out, H).T,
                b=jnp.zeros(b_width, jnp.float32),
            )
        params.append(layer)
    return params


def _attend_head(mat, sched, z, e_dst, e_src, slope, bias=None):
    """alpha-weighted aggregation for one head's projected features z."""
    ones = jnp.ones((z.shape[0], 1), jnp.float32)
    s = sddmm(
        mat,
        sched,
        jnp.concatenate([e_dst, ones], axis=1),  # <[e_dst_r, 1], [1, e_src_c]>
        jnp.concatenate([ones, e_src], axis=1),
    )
    s = ew.leaky_relu(s, slope)
    if bias is not None:
        s = s + bias
    alpha = slot_softmax(mat, sched, s)
    return spmm_attn(mat, sched, alpha, z)


def forward(params: Sequence[dict], graph, x: jax.Array, config: GATConfig):
    mat, sched = graph
    h = x
    H = config.heads
    bias = _log_weight_bias(mat) if config.edge_weighted else None
    for i, layer in enumerate(params):
        out = config.sizes[i + 1]
        z = h @ layer["W"]  # (n, H*out)
        heads = []
        for hd in range(H):
            zh = z[:, hd * out : (hd + 1) * out]
            e_dst = zh @ layer["a_dst"][hd][:, None]  # (n, 1)
            e_src = zh @ layer["a_src"][hd][:, None]
            heads.append(
                _attend_head(
                    mat, sched, zh, e_dst, e_src, config.att_slope, bias
                )
            )
        if i + 1 < config.num_layers:
            h = jnp.concatenate(heads, axis=1) + layer["b"]
            h = ew.leaky_relu(h, config.leaky_slope)
        else:
            h = sum(heads) / H + layer["b"]  # average heads on the output
    return h


def loss_fn(params, graph, x, y, config: GATConfig, mask=None):
    logits = forward(params, graph, x, config)
    out = softmax_xent(logits, y, mask)
    return out.loss, out.acc


def loss_and_grad(params, graph, x, y, config: GATConfig, mask=None):
    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, graph, x, y, config, mask
    )
    return loss, acc, grads
