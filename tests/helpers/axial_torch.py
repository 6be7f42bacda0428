"""Torch oracle for the lucidrains ``axial_attention`` package (test-only).

The reference's TemporalModel delegates its transformer to the external
``axial_attention`` pip package (reference: src/models/components/temporal_model.py:31-39,
requirements.txt). That package is not installable in this environment, so this
module re-implements it in torch, faithfully to the published package semantics
(axial_attention 0.6.x: AxialImageTransformer with reversible=True), including:

- ``calculate_permutations`` axis bookkeeping for channels-first (b, d, n, l) input,
- PermuteToFrom fold-into-batch around a PreNorm'ed SelfAttention (q has no bias,
  kv projection fused, per-head merge via reshape+transpose),
- AxialPositionalEmbedding: one broadcast-shaped randn parameter per grid axis,
- the conv feed-forward Sequential(ChanLayerNorm, Conv2d d->4d 3x3, LeakyReLU,
  Conv2d 4d->d 3x3) with ChanLayerNorm's (x - mean) / (std + eps) placement
  (NOT /sqrt(var + eps)),
- ReversibleSequence coupling: x duplicated into two streams, per block
  y1 = x1 + f(x2); y2 = x2 + g(y1), streams averaged at exit.

Parameter names/paths match the real package exactly (Deterministic wrappers as
``.f.net`` / ``.g.net``, Sequential indices for the conv FF), so state dicts
produced here have the same keys as a reference Lightning checkpoint's
``net.temporal_model.axial_attn.*`` block — the converter tests rely on this.
"""

from __future__ import annotations

import torch
import torch.nn as nn


def calculate_permutations(num_dimensions: int, emb_dim: int):
    total_dimensions = num_dimensions + 2
    emb_dim = emb_dim if emb_dim > 0 else (emb_dim + total_dimensions)
    axial_dims = [ind for ind in range(1, total_dimensions) if ind != emb_dim]
    permutations = []
    for axial_dim in axial_dims:
        last_two_dims = [axial_dim, emb_dim]
        dims_rest = set(range(0, total_dimensions)) - set(last_two_dims)
        permutation = [*sorted(dims_rest), *last_two_dims]
        permutations.append(permutation)
    return permutations


class ChanLayerNorm(nn.Module):
    def __init__(self, dim: int, eps: float = 1e-5):
        super().__init__()
        self.eps = eps
        self.g = nn.Parameter(torch.ones(1, dim, 1, 1))
        self.b = nn.Parameter(torch.zeros(1, dim, 1, 1))

    def forward(self, x):
        std = torch.var(x, dim=1, unbiased=False, keepdim=True).sqrt()
        mean = torch.mean(x, dim=1, keepdim=True)
        return (x - mean) / (std + self.eps) * self.g + self.b


class PreNorm(nn.Module):
    def __init__(self, dim: int, fn: nn.Module):
        super().__init__()
        self.fn = fn
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        return self.fn(self.norm(x))


class SelfAttention(nn.Module):
    def __init__(self, dim: int, heads: int, dim_heads: int | None = None):
        super().__init__()
        self.dim_heads = (dim // heads) if dim_heads is None else dim_heads
        dim_hidden = self.dim_heads * heads
        self.heads = heads
        self.to_q = nn.Linear(dim, dim_hidden, bias=False)
        self.to_kv = nn.Linear(dim, 2 * dim_hidden, bias=False)
        self.to_out = nn.Linear(dim_hidden, dim)

    def forward(self, x):
        q, k, v = (self.to_q(x), *self.to_kv(x).chunk(2, dim=-1))
        b, _, _, h, e = *q.shape, self.heads, self.dim_heads

        def merge_heads(t):
            return t.reshape(b, -1, h, e).transpose(1, 2).reshape(b * h, -1, e)

        q, k, v = map(merge_heads, (q, k, v))
        dots = torch.einsum("bie,bje->bij", q, k) * (e**-0.5)
        dots = dots.softmax(dim=-1)
        out = torch.einsum("bij,bje->bie", dots, v)
        out = out.reshape(b, h, -1, e).transpose(1, 2).reshape(b, -1, h * e)
        return self.to_out(out)


class PermuteToFrom(nn.Module):
    def __init__(self, permutation, fn: nn.Module):
        super().__init__()
        self.fn = fn
        self.permutation = permutation
        # inverse permutation
        inv = [0] * len(permutation)
        for i, p in enumerate(permutation):
            inv[p] = i
        self.inv_permutation = inv

    def forward(self, x):
        axial = x.permute(*self.permutation).contiguous()
        shape = axial.shape
        *_, t, d = shape
        axial = axial.reshape(-1, t, d)
        axial = self.fn(axial)
        axial = axial.reshape(*shape)
        return axial.permute(*self.inv_permutation).contiguous()


class AxialPositionalEmbedding(nn.Module):
    def __init__(self, dim: int, shape, emb_dim_index: int = 1):
        super().__init__()
        total_dimensions = len(shape) + 2
        ax_dim_indexes = [i for i in range(1, total_dimensions) if i != emb_dim_index]
        self.num_axials = len(shape)
        for i, (axial_dim, axial_dim_index) in enumerate(zip(shape, ax_dim_indexes)):
            full_shape = [1] * total_dimensions
            full_shape[emb_dim_index] = dim
            full_shape[axial_dim_index] = axial_dim
            setattr(self, f"param_{i}", nn.Parameter(torch.randn(*full_shape)))

    def forward(self, x):
        for i in range(self.num_axials):
            x = x + getattr(self, f"param_{i}")
        return x


class Deterministic(nn.Module):
    """The package wraps f/g for RNG bookkeeping; only the ``.net`` path matters."""

    def __init__(self, net: nn.Module):
        super().__init__()
        self.net = net

    def forward(self, x):
        return self.net(x)


class ReversibleBlock(nn.Module):
    def __init__(self, f: nn.Module, g: nn.Module):
        super().__init__()
        self.f = Deterministic(f)
        self.g = Deterministic(g)

    def forward(self, x):
        x1, x2 = torch.chunk(x, 2, dim=1)
        y1 = x1 + self.f(x2)
        y2 = x2 + self.g(y1)
        return torch.cat([y1, y2], dim=1)


class ReversibleSequence(nn.Module):
    def __init__(self, blocks):
        super().__init__()
        self.blocks = nn.ModuleList([ReversibleBlock(f, g) for f, g in blocks])

    def forward(self, x):
        x = torch.cat((x, x), dim=1)
        for block in self.blocks:
            x = block(x)
        return torch.stack(x.chunk(2, dim=1)).mean(dim=0)


class AxialImageTransformer(nn.Module):
    def __init__(
        self,
        dim: int,
        depth: int,
        heads: int = 8,
        dim_heads: int | None = None,
        dim_index: int = 1,
        reversible: bool = True,
        axial_pos_emb_shape=None,
    ):
        super().__init__()
        assert reversible, "the reference always uses reversible=True"
        permutations = calculate_permutations(2, dim_index)

        def get_ff():
            return nn.Sequential(
                ChanLayerNorm(dim),
                nn.Conv2d(dim, dim * 4, 3, padding=1),
                nn.LeakyReLU(inplace=True),
                nn.Conv2d(dim * 4, dim, 3, padding=1),
            )

        self.pos_emb = (
            AxialPositionalEmbedding(dim, axial_pos_emb_shape, dim_index)
            if axial_pos_emb_shape is not None
            else nn.Identity()
        )
        layers = []
        for _ in range(depth):
            attn_functions = [
                PermuteToFrom(p, PreNorm(dim, SelfAttention(dim, heads, dim_heads)))
                for p in permutations
            ]
            conv_functions = [get_ff(), get_ff()]
            layers.append(attn_functions)
            layers.append(conv_functions)
        self.layers = ReversibleSequence(layers)

    def forward(self, x):
        x = self.pos_emb(x)
        return self.layers(x)


class ClassificationHead(nn.Module):
    """reference: src/models/components/classification_head.py:4-15"""

    def __init__(self, emb_size: int, n_classes: int):
        super().__init__()
        self.layer_norm = nn.LayerNorm(emb_size)
        self.linear = nn.Linear(emb_size, n_classes)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        return self.sigmoid(self.linear(self.layer_norm(x)))


class TemporalModel(nn.Module):
    """reference: src/models/components/temporal_model.py:8-77 (torch oracle)."""

    def __init__(
        self,
        input_size: int,
        emb_size: int,
        output_size: int,
        heads: int,
        dim_heads: int | None,
        depth: int,
        num_segments: int,
        seg_length: int,
    ):
        super().__init__()
        self.num_segments = num_segments
        self.seg_length = seg_length
        self.projection = nn.Linear(input_size, emb_size)
        self.axial_attn = AxialImageTransformer(
            dim=emb_size,
            depth=depth,
            heads=heads,
            dim_heads=dim_heads,
            reversible=True,
            axial_pos_emb_shape=(num_segments, seg_length),
        )
        self.classifier = ClassificationHead(emb_size, output_size)

    def forward(self, features, segment_size, test_mode):
        features = self.projection(features)
        n, l = self.num_segments, self.seg_length
        d = features.shape[-1]
        if test_mode:
            # (b n s l) d -> (b s) n l d
            features = features.reshape(-1, n, segment_size, l, d)
            features = features.permute(0, 2, 1, 3, 4).reshape(-1, n, l, d)
        else:
            features = features.reshape(-1, n, l, d)
        features = features.permute(0, 3, 1, 2)  # b n l d -> b d n l
        features = self.axial_attn(features)
        features = features.permute(0, 2, 3, 1)  # b d n l -> b n l d
        if test_mode:
            # (b s) n l d -> (b n s l) d
            features = features.reshape(-1, segment_size, n, l, d)
            features = features.permute(0, 2, 1, 3, 4).reshape(-1, d)
        else:
            features = features.reshape(-1, d)
        return self.classifier(features)
