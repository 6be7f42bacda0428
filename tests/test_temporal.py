"""Axial temporal model: numerical oracle parity + semantic invariants.

The reference's attention core is the external ``axial_attention`` pip package
(unavailable offline). tests/helpers/axial_torch.py re-implements it in torch,
faithful to the published package (same math, same parameter paths); the parity
tests below assert the JAX model matches that oracle through the weight converter
at the reference's real shapes (emb 128/256, depth 1/2, 32x16 grid), including the
reversible coupling and the conv-FF ChanLayerNorm eps placement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anomalyclip_tpu.models.temporal import (
    TemporalConfig,
    axial_transformer,
    init_temporal_params,
    temporal_scores,
)

N, L, D_IN, EMB = 4, 3, 20, 16

CFG = TemporalConfig(
    input_size=D_IN, emb_size=EMB, depth=2, heads=4, dim_heads=None,
    num_segments=N, seg_length=L,
)


@pytest.fixture(scope="module")
def params():
    return init_temporal_params(jax.random.PRNGKey(0), CFG)


def test_train_mode_shapes(params):
    b = 6
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((b * N * L, D_IN)), jnp.float32)
    scores = temporal_scores(feats, params, CFG, test_mode=False)
    assert scores.shape == (b * N * L, 1)
    assert (np.asarray(scores) > 0).all() and (np.asarray(scores) < 1).all()


def test_test_mode_segment_folding(params):
    """segment_size=s folds into batch: each 32x16 grid is scored independently, and
    the output ordering is (b n s l) (temporal_model.py:45-53, 69-71)."""
    b, s = 2, 3
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((b * N * s * L, D_IN)).astype(np.float32)
    scores = np.asarray(temporal_scores(jnp.asarray(feats), params, CFG, segment_size=s, test_mode=True))
    assert scores.shape == (b * N * s * L, 1)

    # Scoring each s-chunk alone must agree with the folded batch: rebuild the
    # per-chunk inputs by slicing the (b n s l) layout at fixed s.
    grid = feats.reshape(b, N, s, L, D_IN)
    for si in range(s):
        single = grid[:, :, si]  # (b, N, L, D_IN)
        single_scores = np.asarray(
            temporal_scores(jnp.asarray(single.reshape(-1, D_IN)), params, CFG, test_mode=False)
        ).reshape(b, N, L)
        folded = scores.reshape(b, N, s, L)[:, :, si]
        np.testing.assert_allclose(folded, single_scores, rtol=1e-5, atol=1e-6)


def test_axial_attention_axes_are_separate(params):
    """Segment-axis attention mixes across n only; frame-axis across l only. A
    perturbation at grid cell (n0, l0) may only affect row n0 and column l0 after a
    single attention (checked via a depth-1, attention-only transform)."""
    cfg1 = TemporalConfig(
        input_size=D_IN, emb_size=EMB, depth=1, heads=4, dim_heads=None,
        num_segments=N, seg_length=L,
    )
    p1 = init_temporal_params(jax.random.PRNGKey(1), cfg1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, N, L, EMB)), jnp.float32)

    from anomalyclip_tpu.models.temporal import _attn_along_segments, _attn_along_frames

    attn_p = p1["layers"][0]["attn_n"]
    y = np.asarray(_attn_along_segments(x, attn_p, cfg1))
    x2 = x.at[0, 1, 2].add(10.0)
    y2 = np.asarray(_attn_along_segments(x2, attn_p, cfg1))
    delta = np.abs(y2 - y).sum(axis=-1)[0]  # (N, L)
    # only column l=2 may change (attention runs along n at fixed l)
    assert delta[:, 2].max() > 0
    np.testing.assert_allclose(delta[:, [0, 1]], 0, atol=1e-6)

    attn_p = p1["layers"][0]["attn_l"]
    y = np.asarray(_attn_along_frames(x, attn_p, cfg1))
    y2 = np.asarray(_attn_along_frames(x2, attn_p, cfg1))
    delta = np.abs(y2 - y).sum(axis=-1)[0]
    # only row n=1 may change
    assert delta[1].max() > 0
    np.testing.assert_allclose(delta[[0, 2, 3]], 0, atol=1e-6)


def test_reversible_coupling_structure(params):
    """y1 = x1 + f(x2), y2 = x2 + g(y1), streams averaged at exit: with all-zero
    attention/ff outputs the transform reduces to identity + positional embedding."""
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    # keep positional embeddings zero too -> pure identity
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, N, L, EMB)), jnp.float32)
    # zero params make f(x)=g(x)=const bias terms; with zero biases output == input
    y = axial_transformer(x, zeroed, CFG)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize(
    "emb,depth,heads,input_size",
    [
        (128, 1, 8, 512),   # XD-Violence config (configs/model/anomaly_clip_xdviolence.yaml)
        (256, 2, 8, 529),   # ShanghaiTech config incl. concat_features input size
    ],
)
def test_matches_torch_axial_oracle(emb, depth, heads, input_size):
    """JAX temporal model == torch axial_attention oracle at reference shapes."""
    import torch

    from tests.helpers.axial_torch import TemporalModel as TorchTemporalModel

    from anomalyclip_tpu.convert_ckpt import temporal_params_from_torch

    n, l = 32, 16
    torch.manual_seed(0)
    oracle = TorchTemporalModel(
        input_size=input_size, emb_size=emb, output_size=1, heads=heads,
        dim_heads=None, depth=depth, num_segments=n, seg_length=l,
    ).float().eval()

    sd = {k: np.asarray(v.detach().numpy()) for k, v in oracle.state_dict().items()}
    params = temporal_params_from_torch(sd, prefix="")

    cfg = TemporalConfig(
        input_size=input_size, emb_size=emb, depth=depth, heads=heads,
        dim_heads=None, num_segments=n, seg_length=l,
    )

    rng = np.random.default_rng(0)
    b = 2
    feats = rng.standard_normal((b * n * l, input_size)).astype(np.float32)

    with torch.no_grad():
        want = oracle(torch.from_numpy(feats), segment_size=1, test_mode=False).numpy()
    got = np.asarray(temporal_scores(jnp.asarray(feats), params, cfg, test_mode=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_matches_torch_axial_oracle_test_mode():
    """Test-mode segment folding matches the oracle ((b n s l) layout)."""
    import torch

    from tests.helpers.axial_torch import TemporalModel as TorchTemporalModel

    from anomalyclip_tpu.convert_ckpt import temporal_params_from_torch

    n, l, emb, input_size, s = 32, 16, 128, 512, 3
    torch.manual_seed(1)
    oracle = TorchTemporalModel(
        input_size=input_size, emb_size=emb, output_size=1, heads=8,
        dim_heads=None, depth=1, num_segments=n, seg_length=l,
    ).float().eval()
    sd = {k: np.asarray(v.detach().numpy()) for k, v in oracle.state_dict().items()}
    params = temporal_params_from_torch(sd, prefix="")
    cfg = TemporalConfig(
        input_size=input_size, emb_size=emb, depth=1, heads=8, dim_heads=None,
        num_segments=n, seg_length=l,
    )
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1 * n * s * l, input_size)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(feats), segment_size=s, test_mode=True).numpy()
    got = np.asarray(
        temporal_scores(jnp.asarray(feats), params, cfg, segment_size=s, test_mode=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_gradients_flow(params):
    feats = jnp.asarray(np.random.default_rng(4).standard_normal((2 * N * L, D_IN)), jnp.float32)

    def loss_fn(p):
        return jnp.sum(temporal_scores(feats, p, CFG, test_mode=False))

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # every parameter tensor receives gradient signal
    nonzero = [float(np.abs(np.asarray(g)).max()) > 0 for g in leaves]
    assert sum(nonzero) >= len(leaves) - 2  # pos embeddings of unused axes may be tiny
