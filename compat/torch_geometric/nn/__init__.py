"""First-party GATv2Conv with torch_geometric's parameter and forward contract.

Semantics (matching PyG GATv2Conv(in, out, heads, concat=True, share_weights=False,
negative_slope=0.2, add_self_loops=True, bias=True), the configuration used by the
reference SpatialEncoder at /root/reference/src/model/modules.py:329-336):

    for each edge j -> i (source j = edge_index[0], target i = edge_index[1]),
    plus one self loop per node when add_self_loops:
        e_ij    = att_h . leaky_relu( lin_l(x_j) + lin_r(x_i) )     per head h
        alpha_ij = softmax over incoming edges of node i  (dropout when training)
        out_i   = sum_j alpha_ij * lin_l(x_j)    heads concatenated, + bias

State-dict keys: lin_l.{weight,bias}, lin_r.{weight,bias}, att (1, H, C),
bias (H*C) — the exact names tec_mollm_tpu.models.ref_import consumes, and the
same math as tec_mollm_tpu.models.gat.GATv2 (equivalence pinned in
tests/test_pyg_shim.py).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class GATv2Conv(nn.Module):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        heads: int = 1,
        concat: bool = True,
        negative_slope: float = 0.2,
        dropout: float = 0.0,
        add_self_loops: bool = True,
        bias: bool = True,
        share_weights: bool = False,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.heads = heads
        self.concat = concat
        self.negative_slope = negative_slope
        self.dropout = dropout
        self.add_self_loops = add_self_loops
        self.share_weights = share_weights

        self.lin_l = nn.Linear(in_channels, heads * out_channels, bias=bias)
        if share_weights:
            self.lin_r = self.lin_l
        else:
            self.lin_r = nn.Linear(in_channels, heads * out_channels, bias=bias)
        self.att = nn.Parameter(torch.empty(1, heads, out_channels))
        out_dim = heads * out_channels if concat else out_channels
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_dim))
        else:
            self.register_parameter("bias", None)
        self.reset_parameters()

    def reset_parameters(self) -> None:
        # PyG's glorot: xavier-uniform weights, zero biases
        nn.init.xavier_uniform_(self.lin_l.weight)
        if self.lin_l.bias is not None:
            nn.init.zeros_(self.lin_l.bias)
        if not self.share_weights:
            nn.init.xavier_uniform_(self.lin_r.weight)
            if self.lin_r.bias is not None:
                nn.init.zeros_(self.lin_r.bias)
        # glorot on (1, H, C): fan treated as (H*C//?) — PyG uses the tensor's
        # last-two-dims fan; xavier over the full att tensor is the same recipe
        fan = self.att.shape[-1] * self.att.shape[-2]
        bound = math.sqrt(6.0 / fan)
        nn.init.uniform_(self.att, -bound, bound)
        if self.bias is not None:
            nn.init.zeros_(self.bias)

    def forward(self, x: torch.Tensor, edge_index: torch.Tensor) -> torch.Tensor:
        """x: (N, F_in); edge_index: (2, E) int64. Returns (N, H*C) for concat."""
        n = x.size(0)
        h, c = self.heads, self.out_channels

        src, dst = edge_index[0], edge_index[1]
        if self.add_self_loops:
            loop = torch.arange(n, device=x.device, dtype=src.dtype)
            src = torch.cat([src, loop])
            dst = torch.cat([dst, loop])

        xl = self.lin_l(x).view(n, h, c)
        xr = self.lin_r(x).view(n, h, c)

        e = F.leaky_relu(xl[src] + xr[dst], self.negative_slope)  # (E, H, C)
        alpha = (e * self.att).sum(dim=-1)  # (E, H)

        # segment softmax over incoming edges of each target node
        alpha_max = torch.full(
            (n, h), float("-inf"), device=x.device, dtype=alpha.dtype
        ).scatter_reduce_(
            0, dst.unsqueeze(-1).expand(-1, h), alpha, reduce="amax",
            include_self=True,
        )
        alpha = torch.exp(alpha - alpha_max[dst])
        denom = torch.zeros(n, h, device=x.device, dtype=alpha.dtype).index_add_(
            0, dst, alpha
        )
        alpha = alpha / denom.clamp_min(torch.finfo(alpha.dtype).tiny)[dst]
        alpha = F.dropout(alpha, p=self.dropout, training=self.training)

        out = torch.zeros(n, h, c, device=x.device, dtype=x.dtype).index_add_(
            0, dst, xl[src] * alpha.unsqueeze(-1)
        )
        out = out.reshape(n, h * c) if self.concat else out.mean(dim=1)
        if self.bias is not None:
            out = out + self.bias
        return out


__all__ = ["GATv2Conv"]
