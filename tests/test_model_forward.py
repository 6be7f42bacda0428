"""Composite-model forward invariants: grid evaluator == reference-layout forward,
gradient flow through the full train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anomalyclip_tpu.data.dataset import TestItem
from anomalyclip_tpu.eval.evaluator import GridScorer, score_video
from anomalyclip_tpu.models.anomaly_clip import AnomalyCLIP, AnomalyCLIPConfig
from anomalyclip_tpu.models.clip.model import CLIPConfig, init_clip_params


@pytest.fixture(scope="module")
def built_model(tmp_path_factory):
    labels_dir = tmp_path_factory.mktemp("labels")
    labels_file = labels_dir / "labels.csv"
    labels_file.write_text(
        "id,name\n0,alpha\n1,beta\n2,gamma\n3,normal\n4,omega\n5,zeta\n"
    )
    clip_cfg = CLIPConfig.tiny()
    clip_params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    cfg = AnomalyCLIPConfig(
        labels_file=str(labels_file),
        emb_size=32,
        depth=1,
        heads=4,
        dim_heads=None,
        num_segments=4,
        seg_length=3,
        concat_features=True,
        normal_id=3,
        num_topk=2,
        num_bottomk=2,
    )
    model, frozen = AnomalyCLIP.build(cfg, clip_params, clip_cfg)
    trainable, bn_state = model.init_trainable(jax.random.PRNGKey(1), frozen)
    return model, frozen, trainable, bn_state


def test_grid_scorer_equals_reference_layout_forward(built_model):
    """The bucketed grid evaluator must produce bit-identical real-frame outputs to
    the reference-layout forward_test (anomaly_clip.py:117-154)."""
    model, frozen, trainable, bn_state = built_model
    rng = np.random.default_rng(0)
    n, l, d = 4, 3, model.embedding_dim
    s = 3  # segment_size not equal to any bucket boundary
    t = n * s * l
    feats = rng.standard_normal((1, t, d)).astype(np.float32)
    ncentroid = rng.standard_normal(d).astype(np.float32)

    sim_ref, scores_ref = model.forward_test(
        frozen, trainable, bn_state, jnp.asarray(feats), jnp.asarray(ncentroid), s
    )

    labels = np.zeros(t - 5, dtype=np.int64)  # true length shorter than padded
    item = TestItem(
        features=feats, frame_labels=labels, video_label=0, segment_size=s, path="x.npy"
    )
    scorer = GridScorer(model, frozen, trainable, bn_state, ncentroid)
    vs = score_video(item, scorer, model)

    np.testing.assert_allclose(
        vs.scores, np.asarray(scores_ref)[: len(labels)], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        vs.similarity, np.asarray(sim_ref)[: len(labels)], rtol=1e-5, atol=1e-6
    )


def test_grid_scorer_bucket_padding_is_inert(built_model):
    """Scores of real grids are unchanged by bucket padding."""
    model, frozen, trainable, bn_state = built_model
    rng = np.random.default_rng(1)
    d = model.embedding_dim
    ncentroid = rng.standard_normal(d).astype(np.float32)
    scorer = GridScorer(model, frozen, trainable, bn_state, ncentroid)

    grids = rng.standard_normal((3, 4, 3, d)).astype(np.float32)
    sim3, sc3 = scorer.score_grids(grids)  # bucket 4
    sim2, sc2 = scorer.score_grids(grids[:2])  # bucket 2
    np.testing.assert_allclose(sc3[: 2 * 12], sc2, rtol=1e-6)
    np.testing.assert_allclose(sim3[: 2 * 12], sim2, rtol=1e-6)


def test_train_forward_and_grad(built_model):
    model, frozen, trainable, bn_state = built_model
    rng = np.random.default_rng(2)
    b, n, l, d = 4, 4, 3, model.embedding_dim
    feats = jnp.asarray(rng.standard_normal((b, n * l, d)), jnp.float32)
    labels = jnp.asarray([0, 1, 3, 3], jnp.int32)  # abnormal first half
    ncentroid = jnp.asarray(rng.standard_normal(d), jnp.float32)
    key = jax.random.PRNGKey(0)

    def loss_fn(tr):
        out, new_bn = model.forward_train(
            frozen, tr, bn_state, feats, labels, ncentroid, key
        )
        return jnp.sum(out.scores) + jnp.sum(out.logits_topk), new_bn

    (val, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
    assert np.isfinite(float(val))
    # BN stats must have been updated
    assert not np.allclose(np.asarray(new_bn.mean), np.asarray(bn_state.mean))
    # prompt ctx and temporal weights receive gradients
    assert float(jnp.abs(grads["prompt_ctx"]).max()) > 0
    assert float(jnp.abs(grads["text_projection"]).max()) > 0
    leaves = jax.tree_util.tree_leaves(grads["temporal"])
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_score_video_averages_crops(built_model):
    """ncrops>1 must produce a TSN-style per-frame consensus: the mean of each
    crop's single-crop scores — not (as a flat crop-major trim would) crop 0
    alone at N-crop cost."""
    model, frozen, trainable, bn_state = built_model
    rng = np.random.default_rng(1)
    n, l, d = 4, 3, model.embedding_dim
    s, ncrops = 2, 3
    t = n * s * l
    feats = rng.standard_normal((ncrops, t, d)).astype(np.float32)
    ncentroid = rng.standard_normal(d).astype(np.float32)
    labels = np.zeros(t - 4, dtype=np.int64)
    scorer = GridScorer(model, frozen, trainable, bn_state, ncentroid)

    def score(features):
        item = TestItem(
            features=features, frame_labels=labels, video_label=0,
            segment_size=s, path="x.npy",
        )
        return score_video(item, scorer, model)

    multi = score(feats)
    singles = [score(feats[c : c + 1]) for c in range(ncrops)]
    np.testing.assert_allclose(
        multi.scores, np.mean([v.scores for v in singles], axis=0),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        multi.similarity, np.mean([v.similarity for v in singles], axis=0),
        rtol=1e-5, atol=1e-6,
    )
