"""Selector parity vs the reference SelectorModel (torch oracle, deterministic paths)."""

import numpy as np
import pytest

from anomalyclip_tpu.models.selector import (
    BNState,
    SelectorConfig,
    batch_norm_apply,
    direction_logits,
    select_topk,
    selector_test,
)
from tests.helpers.reference_oracle import load_reference_selector, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

B, N, L, C, D = 8, 4, 3, 6, 16  # batch, segments, seg_length, classes, feat dim
NORMAL_ID = 2
K = 2

CFG = SelectorConfig(
    normal_id=NORMAL_ID,
    num_segments=N,
    seg_length=L,
    num_topk=K,
    num_bottomk=K,
)


@pytest.fixture(scope="module")
def oracle():
    import torch

    ref = load_reference_selector()
    model = ref.SelectorModel(
        classnames=[f"c{i}" for i in range(C)],
        normal_id=NORMAL_ID,
        logit_scale=torch.nn.Parameter(torch.ones(())),
        num_segments=N,
        seg_length=L,
        select_idx_dropout_topk=0.7,
        select_idx_dropout_bottomk=0.7,
        num_topk=K,
        num_bottomk=K,
    )
    return model


def _random_inputs(seed=0):
    rng = np.random.default_rng(seed)
    image = rng.standard_normal((B * N * L, D)).astype(np.float32)
    text = rng.standard_normal((C, D)).astype(np.float32)
    ncentroid = rng.standard_normal((D,)).astype(np.float32)
    labels = np.concatenate(
        [
            rng.choice([0, 1, 3, 4, 5], size=B // 2),  # abnormal: anything but normal
            np.full(B // 2, NORMAL_ID),
        ]
    ).astype(np.int64)
    return image, text, ncentroid, labels


def test_test_mode_similarity_matches(oracle):
    import torch

    image, text, ncentroid, labels = _random_inputs()
    oracle.eval()
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(image),
            torch.from_numpy(text),
            torch.from_numpy(labels),
            torch.from_numpy(ncentroid),
            True,
        ).numpy()

    got = np.asarray(
        selector_test(image, text, ncentroid, BNState.create(C - 1), CFG)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batchnorm_train_stats_match_torch():
    import torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal((50, C - 1)).astype(np.float32) * 3 + 1
    bn = torch.nn.BatchNorm1d(C - 1, affine=False)
    bn.train()
    want = bn(torch.from_numpy(x)).detach().numpy()

    got, new_state = batch_norm_apply(x, BNState.create(C - 1), training=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.mean), bn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_state.var), bn.running_var.numpy(), rtol=1e-4, atol=1e-5
    )


def test_select_topk_and_bottomk_match_with_fixed_mask(oracle):
    import torch

    rng = np.random.default_rng(2)
    logits = rng.standard_normal((B, N * L, C - 1)).astype(np.float32)
    _, _, _, labels = _random_inputs(3)
    # fixed keep-mask with at least num_topk kept segments per video
    mask = rng.random((B, N)) < 0.6
    for i in range(B):
        mask[i, : K + 1] = True

    mask_t = torch.from_numpy(mask.astype(np.float32))
    mask_expanded = mask_t.unsqueeze(2).expand([-1, -1, C - 1])
    logits_t = torch.from_numpy(logits)
    labels_t = torch.from_numpy(labels)

    want_sel, want_idx = oracle.select_topk(logits_t, labels_t, mask_expanded)
    got_sel, got_idx_abn, got_idx_nor = select_topk(logits, labels, mask, CFG, largest=True)
    got_idx = np.concatenate([np.asarray(got_idx_abn), np.asarray(got_idx_nor)])
    np.testing.assert_array_equal(got_idx, want_idx.numpy())
    np.testing.assert_allclose(
        np.asarray(got_sel), want_sel.reshape(-1, C - 1).numpy(), rtol=1e-5, atol=1e-6
    )

    want_sel_b, want_idx_b = oracle.select_bottomk(logits_t, labels_t, mask_expanded)
    got_sel_b, got_idx_abn_b, got_idx_nor_b = select_topk(
        logits, labels, mask, CFG, largest=False
    )
    got_idx_b = np.concatenate([np.asarray(got_idx_abn_b), np.asarray(got_idx_nor_b)])
    np.testing.assert_array_equal(got_idx_b, want_idx_b.numpy())
    np.testing.assert_allclose(
        np.asarray(got_sel_b), want_sel_b.reshape(-1, C - 1).numpy(), rtol=1e-5, atol=1e-6
    )


def test_direction_logits_shape_and_normal_drop():
    image, text, ncentroid, _ = _random_inputs(4)
    out = np.asarray(direction_logits(image, text, ncentroid, NORMAL_ID))
    assert out.shape == (B * N * L, C - 1)
    # the normal class direction must not participate: perturbing it changes nothing
    text2 = text.copy()
    text2[NORMAL_ID] += 100.0
    out2 = np.asarray(direction_logits(image, text2, ncentroid, NORMAL_ID))
    np.testing.assert_array_equal(out, out2)


@pytest.mark.parametrize("k", [1, N])
def test_select_topk_edge_k(oracle, k):
    """k=1 (single segment) and k=num_segments (select everything) vs the oracle —
    boundary cases the default config never exercises."""
    import torch

    ref = load_reference_selector()
    oracle_k = ref.SelectorModel(
        classnames=[f"c{i}" for i in range(C)],
        normal_id=NORMAL_ID,
        logit_scale=torch.nn.Parameter(torch.ones(())),
        num_segments=N,
        seg_length=L,
        select_idx_dropout_topk=0.7,
        select_idx_dropout_bottomk=0.7,
        num_topk=k,
        num_bottomk=k,
    )
    cfg_k = SelectorConfig(
        normal_id=NORMAL_ID, num_segments=N, seg_length=L, num_topk=k, num_bottomk=k
    )
    rng = np.random.default_rng(4 + k)
    logits = rng.standard_normal((B, N * L, C - 1)).astype(np.float32)
    _, _, _, labels = _random_inputs(5)
    mask = np.ones((B, N), dtype=bool)  # keep all: k=N requires every segment

    mask_t = torch.ones((B, N))
    mask_expanded = mask_t.unsqueeze(2).expand([-1, -1, C - 1])
    logits_t = torch.from_numpy(logits)
    labels_t = torch.from_numpy(labels)

    for largest, fn in ((True, oracle_k.select_topk), (False, oracle_k.select_bottomk)):
        want_sel, want_idx = fn(logits_t, labels_t, mask_expanded)
        got_sel, got_idx_abn, got_idx_nor = select_topk(
            logits, labels, mask, cfg_k, largest=largest
        )
        got_idx = np.concatenate([np.asarray(got_idx_abn), np.asarray(got_idx_nor)])
        np.testing.assert_array_equal(got_idx, want_idx.numpy())
        np.testing.assert_allclose(
            np.asarray(got_sel), want_sel.reshape(-1, C - 1).numpy(), rtol=1e-5, atol=1e-6
        )
