"""Torch-free golden parity: frozen fixtures pin the reference-verified numerics.

The deeper oracle suite (tests/test_full_pipeline_oracle.py, test_clip_parity.py)
proves parity against the reference's own torch code, but it ``skipif``-waives
itself on any host missing torch or /root/reference. These tests re-check the
same numerics against fixtures frozen by scripts/gen_golden.py WITH the torch
oracle in the loop (each fixture's gen-time verification is documented there):

- tokenizer ids, bit-exact (reference: src/models/components/clip/clip.py:225-268)
- full-shape ViT-B/16 image+text features at fp32 (reference: model.py:174-430;
  frozen numbers matched the same weights through torch to ~1e-6 relative)
- the composed tiny pipeline: ncentroid, train forward + 7-term loss, eval
  epoch + metrics, and a 3-step optimization trajectory
  (reference: anomaly_clip.py:107-215, loss.py:51-195,
  anomaly_clip_module.py:147-170/203-296/459-592/693-746)
- detection metrics on a fixed score corpus (sklearn-verified at gen time)

A MISSING fixture fails loudly instead of skipping — silent waiving is the
failure mode this module exists to close. Tolerances carry headroom for
XLA/BLAS version drift on CPU (the suite platform, tests/conftest.py); a real
parity break is orders of magnitude larger.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from anomalyclip_tpu.utils.treeio import flatten_tree, unflatten_tree

GOLDEN = Path(__file__).resolve().parent / "golden"


def _load(name: str) -> dict:
    path = GOLDEN / name
    assert path.is_file(), (
        f"golden fixture {name} missing — regenerate with scripts/gen_golden.py "
        "on a host with torch + /root/reference (do not skip: these are the "
        "torch-free parity anchors)"
    )
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------


def test_tokenizer_golden():
    from anomalyclip_tpu.models.anomaly_clip import read_classnames
    from anomalyclip_tpu.models.clip.tokenizer import tokenize

    d = _load("tokenizer.npz")
    np.testing.assert_array_equal(
        np.asarray(tokenize([str(t) for t in d["texts"]])), d["texts_ids"]
    )
    labels_dir = Path(__file__).resolve().parents[1] / "anomalyclip_tpu" / "labels"
    for ds in ("ucf", "sht", "xd", "synthetic"):
        classnames = read_classnames(labels_dir / f"{ds}_labels.csv")
        assert list(classnames) == [str(c) for c in d[f"{ds}_classnames"]], ds
        prefix = " ".join(["X"] * 8)
        prompts = [f"{prefix} {name}." for name in classnames]
        np.testing.assert_array_equal(
            np.asarray(tokenize(prompts)), d[f"{ds}_prompt_ids"], err_msg=ds
        )
        np.testing.assert_array_equal(
            np.asarray(tokenize(list(classnames))), d[f"{ds}_name_ids"], err_msg=ds
        )


# ---------------------------------------------------------------------------
# full-shape ViT-B/16 encoders
# ---------------------------------------------------------------------------


def test_clip_b16_features_golden():
    """fp32 image+text features from the PRNGKey(0)-seeded full-shape tower must
    reproduce the frozen, torch-verified numbers. Exercises QuickGELU, fp32
    LayerNorm, the 197-token attention stack, patchify-as-matmul, on-device
    uint8 normalize, and the EOT gather at the released-checkpoint shapes."""
    import jax

    from anomalyclip_tpu.models.clip.model import (
        CLIPConfig,
        encode_image,
        encode_text,
        init_clip_params,
    )

    d = _load("clip_b16.npz")
    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    img = np.asarray(encode_image(params, cfg, d["image_u8"]))
    txt = np.asarray(encode_text(params, cfg, d["text_ids"]))
    # ~3e-5 relative headroom on feature scale ~3: far above XLA version drift,
    # far below any layout/activation/normalization bug
    np.testing.assert_allclose(img, d["image_features"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(txt, d["text_features"], rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# detection metrics
# ---------------------------------------------------------------------------


def test_metrics_golden():
    from anomalyclip_tpu.eval.metrics import detection_metrics

    d = _load("metrics.npz")
    det = detection_metrics(
        d["scores"], d["labels"], d["class_probs"],
        int(d["normal_id"]), int(d["num_classes"]),
    )
    got = np.asarray(
        [det["auc_roc"], det["auc_pr"], det["mean_mc_auroc"],
         det["mean_mc_aupr"], det["optimal_threshold"]]
    )
    np.testing.assert_allclose(got, d["expected"], rtol=0, atol=1e-9)
    np.testing.assert_allclose(det["mc_auroc"], d["mc_auroc"], atol=1e-9)
    np.testing.assert_allclose(det["mc_aupr"], d["mc_aupr"], atol=1e-9)


# ---------------------------------------------------------------------------
# composed tiny pipeline
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    """Synthetic corpus + module adopted onto the frozen golden state."""
    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip.model import CLIPConfig
    from anomalyclip_tpu.models.selector import BNState
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule
    from tests.helpers.synthetic_run import synthetic_cfg

    # must match scripts/gen_golden.py TINY_OVERRIDES
    overrides = (
        "model.net.select_idx_dropout_topk=0.0",
        "model.net.select_idx_dropout_bottomk=0.0",
        "model.net.emb_size=32",
        "data.num_workers=0",
    )
    cfg = synthetic_cfg(tmp_path_factory.mktemp("golden_tiny"), *overrides)
    module = AnomalyCLIPTrainModule(cfg)  # regenerates the seeded corpus

    flat = _load("tiny_state.npz")
    frozen = unflatten_tree(
        {k[len("frozen/"):]: v for k, v in flat.items() if k.startswith("frozen/")}
    )
    trainable = unflatten_tree(
        {k[len("trainable/"):]: v for k, v in flat.items()
         if k.startswith("trainable/")}
    )
    bn = BNState(mean=jnp.asarray(flat["bn/mean"]), var=jnp.asarray(flat["bn/var"]))
    clip_cfg = CLIPConfig(
        **{
            f: int(flat[f"clip_cfg/{f}"])
            for f in (
                "embed_dim", "image_resolution", "vision_layers", "vision_width",
                "vision_patch_size", "context_length", "vocab_size",
                "transformer_width", "transformer_heads", "transformer_layers",
            )
        }
    )
    state = module.adopt_converted_state(frozen, trainable, bn, clip_cfg)
    return {
        "cfg": cfg,
        "module": module,
        "state": state,
        "clip_cfg": clip_cfg,
        "golden": _load("tiny_pipeline.npz"),
    }


def test_tiny_ncentroid_golden(tiny):
    ours = np.asarray(tiny["module"].compute_ncentroid())
    np.testing.assert_allclose(ours, tiny["golden"]["ncentroid"], rtol=1e-5, atol=1e-5)


def test_tiny_train_forward_and_loss_golden(tiny):
    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.models.losses import compute_loss
    from tests.helpers.golden_inputs import train_forward_inputs

    cfg, module, state, g = tiny["cfg"], tiny["module"], tiny["state"], tiny["golden"]
    n = int(cfg.model.net.num_segments)
    l = int(cfg.model.net.seg_length)
    feats, labels = train_forward_inputs(
        int(cfg.data.num_classes), int(cfg.data.normal_id),
        n, l, int(tiny["clip_cfg"].embed_dim),
    )
    fwd, new_bn = module.model.forward_train(
        module.frozen, state.trainable, state.bn_state,
        jnp.asarray(feats[:, 0]), jnp.asarray(labels),
        jnp.asarray(g["ncentroid"]), jax.random.PRNGKey(0),
    )
    for name in ("logits", "logits_topk", "scores"):
        np.testing.assert_allclose(
            np.asarray(getattr(fwd, name)), g[f"train/{name}"],
            rtol=1e-4, atol=2e-5, err_msg=name,
        )
    for name in ("idx_topk_abn", "idx_topk_nor", "idx_bottomk_abn"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fwd, name)), g[f"train/{name}"], err_msg=name
        )
    np.testing.assert_allclose(np.asarray(new_bn.mean), g["train/bn_mean"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_bn.var), g["train/bn_var"], atol=1e-6)
    terms = compute_loss(
        fwd.logits, fwd.logits_topk, jnp.asarray(labels), fwd.scores,
        fwd.idx_topk_abn, fwd.idx_topk_nor, fwd.idx_bottomk_abn, module.loss_cfg,
    )
    np.testing.assert_allclose(
        np.asarray([float(t) for t in terms]), g["train/loss_terms"],
        rtol=2e-4, atol=1e-5,
    )


def test_tiny_eval_epoch_golden(tiny):
    from anomalyclip_tpu.eval.evaluator import evaluate_videos
    from anomalyclip_tpu.eval.metrics import detection_metrics

    cfg, module, state, g = tiny["cfg"], tiny["module"], tiny["state"], tiny["golden"]
    module.ncentroid = np.asarray(g["ncentroid"])
    ev = evaluate_videos(
        module.datamodule.test_dataloader(), module._scorer(state), module.model
    )
    np.testing.assert_array_equal(ev["labels"], g["eval/labels"])
    np.testing.assert_allclose(
        ev["abnormal_scores"], g["eval/abnormal_scores"], rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        ev["class_probs"], g["eval/class_probs"], rtol=1e-4, atol=2e-5
    )
    det = detection_metrics(
        ev["abnormal_scores"], ev["labels"], ev["class_probs"],
        int(cfg.data.normal_id), int(cfg.data.num_classes),
    )
    got = np.asarray(
        [det["auc_roc"], det["auc_pr"], det["mean_mc_auroc"],
         det["mean_mc_aupr"], det["optimal_threshold"]]
    )
    np.testing.assert_allclose(got, g["eval/metrics"], atol=1e-4)


def test_tiny_three_step_trajectory_golden(tiny):
    """Three production train steps (jitted forward+backward+AdamW with the
    4-group LRs) must reproduce the frozen per-step losses and end weights.
    Step k's loss depends on step k-1's update, so this pins the whole
    gradient + optimizer chain torch-free."""
    import jax
    import jax.numpy as jnp

    from anomalyclip_tpu.data.loader import TrainBatch
    from anomalyclip_tpu.train.module import TrainState
    from anomalyclip_tpu.train.optim import build_optimizer
    from tests.helpers.golden_inputs import trajectory_batches

    cfg, module, state, g = tiny["cfg"], tiny["module"], tiny["state"], tiny["golden"]
    n = int(cfg.model.net.num_segments)
    l = int(cfg.model.net.seg_length)
    solver = dict(cfg.model.solver)
    solver["lr"] = base_lr = 1e-3
    sched = dict(cfg.model.get("scheduler", {}))
    sched["warmup_epochs"] = 0
    tx = build_optimizer(
        solver, dict(cfg.model.get("optimizer", {})), sched, steps_per_epoch=1000
    )
    tstate = TrainState(
        trainable=state.trainable,
        opt_state=tx.init(state.trainable),
        bn_state=state.bn_state,
        step=jnp.zeros((), jnp.int32),
    )
    train_step = module._build_train_step(tx)
    half = 4
    losses = []
    for feats, labels in trajectory_batches(
        int(cfg.data.num_classes), int(cfg.data.normal_id),
        n, l, int(tiny["clip_cfg"].embed_dim),
    ):
        batch = TrainBatch(
            abnormal_features=feats[:half], abnormal_labels=labels[:half],
            normal_features=feats[half:], normal_labels=labels[half:],
        )
        sums = module._zero_metric_sums()
        tstate, sums = train_step(
            module.frozen, tstate, batch, jnp.asarray(g["ncentroid"]),
            jax.random.PRNGKey(0), sums,
        )
        losses.append(float(sums["train/loss"]))
    np.testing.assert_allclose(losses, g["steps/losses"], rtol=5e-4, atol=1e-5)

    got = flatten_tree(
        jax.tree_util.tree_map(np.asarray, tstate.trainable), "steps/after3"
    )
    for key, want in (
        (k, v) for k, v in g.items() if k.startswith("steps/after3/")
    ):
        ours = got[key]
        diff = np.abs(ours - want)
        # Adam two-tier (see the oracle test's tolerance note): near-zero-gradient
        # elements may flip update sign on fp32 rounding drift, bounded by ~lr/step
        np.testing.assert_array_less(diff.max(), 2 * base_lr * 3, err_msg=key)
        tight = diff <= 5e-5 + 1e-3 * np.abs(want)
        assert tight.mean() >= 0.999, (key, float(1 - tight.mean()))
    np.testing.assert_allclose(
        np.asarray(tstate.bn_state.mean), g["steps/bn_mean"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(tstate.bn_state.var), g["steps/bn_var"], rtol=1e-5, atol=1e-6
    )


def test_treeio_roundtrip(tmp_path):
    """flatten/unflatten/npz round-trip incl. list levels and scalar leaves."""
    from anomalyclip_tpu.utils.treeio import load_tree_npz, save_tree_npz

    rng = np.random.default_rng(0)
    tree = {
        "a": {"w": rng.standard_normal((3, 4)).astype(np.float32), "b": np.float32(2.5)},
        "layers": [
            {"x": np.arange(5), "y": {"z": rng.standard_normal(2)}},
            {"x": np.arange(3), "y": {"z": rng.standard_normal(2)}},
        ],
        "step": np.int32(7),
    }
    path = tmp_path / "tree.npz"
    save_tree_npz(path, tree)
    back = load_tree_npz(path)
    assert isinstance(back["layers"], list) and len(back["layers"]) == 2
    flat_a = flatten_tree(tree)
    flat_b = flatten_tree(back)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])
