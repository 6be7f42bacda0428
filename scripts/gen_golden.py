#!/usr/bin/env python
"""Generate the frozen golden parity fixtures under tests/golden/.

The torch-oracle suite (tests/test_full_pipeline_oracle.py, test_clip_parity.py,
...) proves our numerics against the reference's own torch code, but it waives
itself via ``skipif`` on any host without torch + the reference checkout. This
script runs ONCE on a host that has both, freezes the verified numbers into
small ``.npz`` fixtures, and ``tests/test_golden.py`` re-checks them torch-free
forever after (VERDICT r4 item 1).

Fixtures (all inputs either stored or rebuilt from fixed numpy/JAX seeds):

- ``tokenizer.npz``   — CoOp prompt token ids for all four class-name sets +
  generic texts, verified against the reference tokenizer
  (reference: src/models/components/clip/clip.py:225-268).
- ``clip_b16.npz``    — full-shape ViT-B/16 image+text features at fp32 from
  JAX-seeded weights, verified by reverse-converting the exact same weights
  into the reference's torch CLIP (reference: model.py:174-430).
- ``tiny_state.npz``  — the converted parameter trees of the tiny composed
  oracle net (torch seed 7, the same construction as the full-pipeline oracle;
  unused vocab rows zeroed so the fixture compresses).
- ``tiny_pipeline.npz`` — composed train/test forward outputs, 7-term loss,
  eval-epoch arrays + metrics, and a 3-step optimization trajectory on the
  synthetic corpus, anchored by running the oracle suite first
  (reference: anomaly_clip.py:107-215, loss.py:51-195,
  anomaly_clip_module.py:203-296/459-592).
- ``metrics.npz``     — detection metrics on a fixed synthetic score corpus,
  verified against scikit-learn.

Usage:  python scripts/gen_golden.py [--only tokenizer clip_b16 ...]
                                     [--skip-oracle-check]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))
GOLDEN_DIR = REPO_ROOT / "tests" / "golden"

# Fixed generic texts for the tokenizer + text-encoder fixtures.
GOLDEN_TEXTS = [
    "a video of fire",
    "an empty street at night",
    "a person stealing a car",
    "X X X X X X X X road accident.",
]
LABEL_SETS = ("ucf", "sht", "xd", "synthetic")


def _labels_file(name: str) -> Path:
    return REPO_ROOT / "anomalyclip_tpu" / "labels" / f"{name}_labels.csv"


def _coop_prompts(classnames, n_ctx: int = 8):
    prefix = " ".join(["X"] * n_ctx)
    return [f"{prefix} {name}." for name in classnames]


# ---------------------------------------------------------------------------
# tokenizer.npz
# ---------------------------------------------------------------------------


def gen_tokenizer() -> None:
    from anomalyclip_tpu.models.anomaly_clip import read_classnames
    from anomalyclip_tpu.models.clip.tokenizer import tokenize

    from tests.helpers import full_oracle as fo

    fo.load_reference_pipeline()  # installs the reference clip package + stubs
    ref_tokenize = sys.modules["src.models.components.clip.clip"].tokenize

    out = {"texts": np.array(GOLDEN_TEXTS)}
    all_texts = list(GOLDEN_TEXTS)
    out["texts_ids"] = np.asarray(tokenize(GOLDEN_TEXTS))
    for ds in LABEL_SETS:
        classnames = read_classnames(_labels_file(ds))
        prompts = _coop_prompts(classnames)
        out[f"{ds}_classnames"] = np.array(classnames)
        out[f"{ds}_prompt_ids"] = np.asarray(tokenize(prompts))
        out[f"{ds}_name_ids"] = np.asarray(tokenize(list(classnames)))
        all_texts += prompts + list(classnames)

    # gen-time verification: bit-exact vs the reference tokenizer
    want = ref_tokenize(all_texts).numpy()
    got = np.asarray(tokenize(all_texts))
    np.testing.assert_array_equal(got, want)

    np.savez_compressed(GOLDEN_DIR / "tokenizer.npz", **out)
    print(f"tokenizer.npz: {len(all_texts)} strings verified vs reference")


# ---------------------------------------------------------------------------
# clip_b16.npz
# ---------------------------------------------------------------------------


def _params_to_torch_clip_sd(params, cfg):
    """Exact inverse of convert.torch_state_dict_to_params for the ViT path —
    gen-time only, so the SAME weights drive both frameworks."""
    import torch

    sd = {}
    v = params["visual"]
    p = cfg.vision_patch_size
    sd["visual.conv1.weight"] = (
        np.asarray(v["patch_embed"]).T.reshape(cfg.vision_width, 3, p, p)
    )
    sd["visual.class_embedding"] = v["class_embedding"]
    sd["visual.positional_embedding"] = v["positional_embedding"]
    sd["visual.ln_pre.weight"] = v["ln_pre"]["scale"]
    sd["visual.ln_pre.bias"] = v["ln_pre"]["bias"]
    sd["visual.ln_post.weight"] = v["ln_post"]["scale"]
    sd["visual.ln_post.bias"] = v["ln_post"]["bias"]
    sd["visual.proj"] = v["proj"]
    t = params["text"]
    sd["token_embedding.weight"] = t["token_embedding"]
    sd["positional_embedding"] = t["positional_embedding"]
    sd["ln_final.weight"] = t["ln_final"]["scale"]
    sd["ln_final.bias"] = t["ln_final"]["bias"]
    sd["text_projection"] = t["text_projection"]
    sd["logit_scale"] = params["logit_scale"]

    for blocks, prefix, layers in (
        (v["blocks"], "visual.transformer", cfg.vision_layers),
        (t["blocks"], "transformer", cfg.transformer_layers),
    ):
        for i in range(layers):
            pre = f"{prefix}.resblocks.{i}"
            sd[f"{pre}.ln_1.weight"] = blocks["ln_1"]["scale"][i]
            sd[f"{pre}.ln_1.bias"] = blocks["ln_1"]["bias"][i]
            sd[f"{pre}.attn.in_proj_weight"] = np.asarray(blocks["attn"]["qkv_w"][i]).T
            sd[f"{pre}.attn.in_proj_bias"] = blocks["attn"]["qkv_b"][i]
            sd[f"{pre}.attn.out_proj.weight"] = np.asarray(blocks["attn"]["out_w"][i]).T
            sd[f"{pre}.attn.out_proj.bias"] = blocks["attn"]["out_b"][i]
            sd[f"{pre}.ln_2.weight"] = blocks["ln_2"]["scale"][i]
            sd[f"{pre}.ln_2.bias"] = blocks["ln_2"]["bias"][i]
            sd[f"{pre}.mlp.c_fc.weight"] = np.asarray(blocks["mlp"]["fc_w"][i]).T
            sd[f"{pre}.mlp.c_fc.bias"] = blocks["mlp"]["fc_b"][i]
            sd[f"{pre}.mlp.c_proj.weight"] = np.asarray(blocks["mlp"]["proj_w"][i]).T
            sd[f"{pre}.mlp.c_proj.bias"] = blocks["mlp"]["proj_b"][i]
    return {
        k: torch.from_numpy(np.ascontiguousarray(np.asarray(x, np.float32)))
        for k, x in sd.items()
    }


def gen_clip_b16() -> None:
    import jax
    import torch

    from anomalyclip_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    from anomalyclip_tpu.models.clip.model import (
        CLIPConfig,
        encode_image,
        encode_text,
        init_clip_params,
    )
    from anomalyclip_tpu.models.clip.tokenizer import tokenize

    from tests.helpers.full_oracle import VIT_B16_CLIP_ARGS
    from tests.helpers.reference_oracle import load_reference_clip_model

    cfg = CLIPConfig.vit_b16()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)

    image_u8 = np.random.default_rng(0).integers(
        0, 256, size=(2, 224, 224, 3), dtype=np.uint8
    )
    text_ids = np.asarray(tokenize(GOLDEN_TEXTS[:2]))

    image_features = np.asarray(encode_image(params, cfg, image_u8))
    text_features = np.asarray(encode_text(params, cfg, text_ids))

    # gen-time verification: the SAME weights through the reference torch CLIP
    ref = load_reference_clip_model()
    model = ref.CLIP(*VIT_B16_CLIP_ARGS).float()
    model.load_state_dict(_params_to_torch_clip_sd(params, cfg))
    model.eval()
    norm = (image_u8.astype(np.float32) / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(
        CLIP_STD
    )
    with torch.no_grad():
        ref_img = model.encode_image(
            torch.from_numpy(norm.transpose(0, 3, 1, 2).copy())
        ).numpy()
        ref_txt = model.encode_text(torch.from_numpy(text_ids.astype(np.int64))).numpy()
    for ours, want, name in (
        (image_features, ref_img, "image"),
        (text_features, ref_txt, "text"),
    ):
        scale = np.abs(want).max()
        err = np.abs(ours - want).max() / scale
        assert err < 3e-4, f"{name} parity {err:.2e} vs torch at full B/16 shape"
        print(f"clip_b16 {name}: max rel err vs torch {err:.2e} (scale {scale:.3f})")

    np.savez_compressed(
        GOLDEN_DIR / "clip_b16.npz",
        image_u8=image_u8,
        text_ids=text_ids,
        image_features=image_features,
        text_features=text_features,
    )
    print("clip_b16.npz written")


# ---------------------------------------------------------------------------
# tiny_state.npz + tiny_pipeline.npz
# ---------------------------------------------------------------------------


# The overrides of the golden tiny pipeline. Dropout 0 makes the single
# stochastic train-forward component deterministic (same rationale as the
# oracle test); emb_size=32 shrinks the temporal conv-FF weights from 9.4MB of
# incompressible floats to ~600KB so the fixture stays a committable size —
# the gen-time torch verification below re-anchors parity AT THIS config.
TINY_OVERRIDES = (
    "model.net.select_idx_dropout_topk=0.0",
    "model.net.select_idx_dropout_bottomk=0.0",
    "model.net.emb_size=32",
    "data.num_workers=0",
)


def _build_tiny_module_and_state(tmp_path: Path):
    """The construction of tests/test_full_pipeline_oracle.py::pipeline, at the
    golden overrides."""
    import torch

    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    from tests.helpers import full_oracle as fo
    from tests.helpers.synthetic_run import synthetic_cfg

    cfg = synthetic_cfg(tmp_path, *TINY_OVERRIDES)
    module = AnomalyCLIPTrainModule(cfg)  # generates the corpus on disk

    net_cfg = {
        k: v
        for k, v in dict(cfg.model.net).items()
        if k not in ("clip_init", "clip_ckpt_path", "compute_dtype")
    }
    net = fo.build_reference_net(net_cfg, clip_seed=7)
    g = torch.Generator().manual_seed(11)
    bn = net.selector_model.bn_layer
    bn.running_mean.copy_(0.3 * torch.randn(bn.running_mean.shape, generator=g))
    bn.running_var.copy_(0.5 + torch.rand(bn.running_var.shape, generator=g))
    return cfg, module, net


def gen_tiny(skip_oracle_check: bool) -> None:
    import jax
    import jax.numpy as jnp
    import torch

    from anomalyclip_tpu.convert_ckpt import (
        convert_lightning_checkpoint,
        converted_clip_config,
        load_lightning_state_dict,
    )
    from anomalyclip_tpu.data.loader import TrainBatch
    from anomalyclip_tpu.eval.evaluator import evaluate_videos
    from anomalyclip_tpu.eval.metrics import detection_metrics
    from anomalyclip_tpu.models.clip.tokenizer import tokenize
    from anomalyclip_tpu.models.losses import compute_loss
    from anomalyclip_tpu.train.module import TrainState
    from anomalyclip_tpu.train.optim import build_optimizer
    from anomalyclip_tpu.utils.treeio import flatten_tree

    from tests.helpers import full_oracle as fo

    if not skip_oracle_check:
        # anchor: the fixtures freeze numbers the oracle suite has just proven
        # against the reference's own torch pipeline (incl. the slow 3-step
        # optimization parity, which uses the same seeds as the trajectory below)
        print("running the torch-oracle suite first (anchors the fixtures)...")
        rc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_full_pipeline_oracle.py",
             "-q", "-p", "no:cacheprovider"],
            cwd=str(REPO_ROOT),
        ).returncode
        assert rc == 0, "oracle suite failed; fix parity before freezing fixtures"

    with tempfile.TemporaryDirectory() as td:
        tmp_path = Path(td)
        cfg, module, net = _build_tiny_module_and_state(tmp_path)
        ckpt = fo.lightning_checkpoint_from_net(net, tmp_path / "oracle.ckpt")
        sd = load_lightning_state_dict(ckpt)
        frozen, trainable, bn_state = convert_lightning_checkpoint(sd)
        clip_cfg = converted_clip_config(sd)

        # zero token-embedding rows no pipeline path reads (the prompt spec only
        # embeds the CoOp prompt tokens) so the 49408-row table compresses away
        classnames = module.model.classnames
        used = np.unique(np.asarray(tokenize(_coop_prompts(classnames))))
        emb = np.asarray(frozen["clip"]["text"]["token_embedding"]).copy()
        mask = np.ones(emb.shape[0], dtype=bool)
        mask[used] = False
        emb[mask] = 0.0
        frozen["clip"]["text"]["token_embedding"] = emb

        state = module.adopt_converted_state(frozen, trainable, bn_state, clip_cfg)

        state_flat = {}
        state_flat.update(flatten_tree(frozen, "frozen"))
        state_flat.update(flatten_tree(trainable, "trainable"))
        state_flat["bn/mean"] = np.asarray(bn_state.mean)
        state_flat["bn/var"] = np.asarray(bn_state.var)
        for f in (
            "embed_dim", "image_resolution", "vision_layers", "vision_width",
            "vision_patch_size", "context_length", "vocab_size",
            "transformer_width", "transformer_heads", "transformer_layers",
        ):
            state_flat[f"clip_cfg/{f}"] = np.asarray(getattr(clip_cfg, f))
        np.savez_compressed(GOLDEN_DIR / "tiny_state.npz", **state_flat)

        out = {}
        import copy

        from tests.helpers.reference_oracle import load_reference_loss

        _, feature_dataset_mod = fo.load_reference_pipeline()
        data_cfg = dict(cfg.data)

        # --- ncentroid bootstrap (anomaly_clip_module.py:147-170) -----------
        ncentroid = module.compute_ncentroid()
        out["ncentroid"] = np.asarray(ncentroid)
        ref_nc = fo.reference_ncentroid(
            fo.reference_normal_test_mode_dataset(data_cfg, feature_dataset_mod),
            net.embedding_dim,
        )
        np.testing.assert_allclose(
            out["ncentroid"], ref_nc.numpy(), rtol=1e-5, atol=1e-5
        )

        # --- train forward + 7-term loss (same inputs as the oracle test) ---
        from tests.helpers.golden_inputs import train_forward_inputs, trajectory_batches

        n = int(cfg.model.net.num_segments)
        l = int(cfg.model.net.seg_length)
        normal_id = int(cfg.data.normal_id)
        num_classes = int(cfg.data.num_classes)
        d = int(clip_cfg.embed_dim)
        feats, labels = train_forward_inputs(num_classes, normal_id, n, l, d)
        fwd, new_bn = module.model.forward_train(
            module.frozen, state.trainable, state.bn_state,
            jnp.asarray(feats[:, 0]), jnp.asarray(labels),
            jnp.asarray(ncentroid), jax.random.PRNGKey(0),
        )
        for name in ("logits", "logits_topk", "scores",
                     "idx_topk_abn", "idx_topk_nor", "idx_bottomk_abn"):
            out[f"train/{name}"] = np.asarray(getattr(fwd, name))
        out["train/bn_mean"] = np.asarray(new_bn.mean)
        out["train/bn_var"] = np.asarray(new_bn.var)
        terms = compute_loss(
            fwd.logits, fwd.logits_topk, jnp.asarray(labels), fwd.scores,
            fwd.idx_topk_abn, fwd.idx_topk_nor, fwd.idx_bottomk_abn,
            module.loss_cfg,
        )
        out["train/loss_terms"] = np.asarray([float(t) for t in terms])

        # torch verify: the reference's composed train forward + 7-term loss
        tnet = copy.deepcopy(net).train()
        with torch.no_grad():
            t_out = tnet(
                torch.from_numpy(feats), torch.from_numpy(labels), ref_nc
            )
        np.testing.assert_allclose(
            out["train/logits"], t_out[0].numpy(), rtol=1e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            out["train/scores"], t_out[2].numpy(), rtol=1e-4, atol=2e-5
        )
        np.testing.assert_array_equal(out["train/idx_topk_abn"], t_out[3].numpy())
        loss_keys = (
            "normal_id", "num_topk", "lambda_dir_abn", "lambda_dir_nor",
            "lambda_topk_abn", "lambda_bottomk_abn", "lambda_topk_nor",
            "lambda_smooth", "lambda_sparse", "frames_per_segment", "num_segments",
        )
        criterion = load_reference_loss().ComputeLoss(
            **{k: v for k, v in dict(cfg.model.loss).items() if k in loss_keys}
        )
        ref_terms = criterion(
            t_out[0], t_out[1], torch.from_numpy(labels), t_out[2],
            t_out[3], t_out[4], t_out[5],
        )
        np.testing.assert_allclose(
            out["train/loss_terms"],
            [float(t) for t in ref_terms],
            rtol=2e-4, atol=1e-5,
        )

        # --- eval epoch over the synthetic test set -------------------------
        module.ncentroid = np.asarray(ncentroid)
        scorer = module._scorer(state)
        ev = evaluate_videos(module.datamodule.test_dataloader(), scorer, module.model)
        out["eval/abnormal_scores"] = ev["abnormal_scores"]
        out["eval/labels"] = ev["labels"]
        out["eval/class_probs"] = ev["class_probs"]
        det = detection_metrics(
            ev["abnormal_scores"], ev["labels"], ev["class_probs"],
            normal_id, int(cfg.data.num_classes),
        )
        out["eval/metrics"] = np.asarray(
            [det["auc_roc"], det["auc_pr"], det["mean_mc_auroc"],
             det["mean_mc_aupr"], det["optimal_threshold"]]
        )

        # torch verify: the reference's full eval epoch over the same corpus
        ref_ev = fo.reference_eval_epoch(
            net, fo.reference_test_dataset(data_cfg, feature_dataset_mod), ref_nc
        )
        np.testing.assert_array_equal(out["eval/labels"], ref_ev["labels"])
        np.testing.assert_allclose(
            out["eval/abnormal_scores"], ref_ev["abnormal_scores"],
            rtol=1e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            out["eval/class_probs"], ref_ev["class_probs"], rtol=1e-4, atol=2e-5
        )

        # --- 3-step optimization trajectory (same seeds as the slow oracle) -
        solver = dict(cfg.model.solver)
        solver["lr"] = 1e-3
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
        for bfeats, blabels in trajectory_batches(num_classes, normal_id, n, l, d):
            batch = TrainBatch(
                abnormal_features=bfeats[:half], abnormal_labels=blabels[:half],
                normal_features=bfeats[half:], normal_labels=blabels[half:],
            )
            sums = module._zero_metric_sums()
            tstate, sums = train_step(
                module.frozen, tstate, batch, jnp.asarray(ncentroid),
                jax.random.PRNGKey(0), sums,
            )
            losses.append(float(sums["train/loss"]))
        out["steps/losses"] = np.asarray(losses)

        # torch verify: the reference's optimizer chain over the same batches
        # (anomaly_clip_module.py:203-244, 693-746; same construction as the
        # slow oracle test, at the golden config)
        tnet3 = copy.deepcopy(net).train()
        for prm in tnet3.image_encoder.parameters():
            prm.requires_grad_(False)
        for prm in tnet3.text_encoder.parameters():
            prm.requires_grad_(False)
        tnet3.text_encoder.text_projection.requires_grad_(True)
        for prm in tnet3.token_embedding.parameters():
            prm.requires_grad_(False)
        base_lr = float(solver["lr"])
        groups = [
            {"params": list(tnet3.selector_model.parameters()),
             "lr": base_lr * float(solver.get("selector_model_ratio", 1))},
            {"params": list(tnet3.temporal_model.parameters()),
             "lr": base_lr * float(solver.get("temporal_model_ratio", 1))},
            {"params": list(tnet3.prompt_learner.parameters()),
             "lr": base_lr * float(solver.get("prompt_learner_ratio", 1))},
            {"params": [tnet3.text_encoder.text_projection],
             "lr": base_lr * float(solver.get("text_projection_ratio", 1))},
        ]
        wd = float(dict(cfg.model.get("optimizer", {})).get("weight_decay", 0.2))
        opt = torch.optim.AdamW(groups, weight_decay=wd)
        ref_losses = []
        for bfeats, blabels in trajectory_batches(num_classes, normal_id, n, l, d):
            opt.zero_grad()
            t3 = tnet3(
                torch.from_numpy(bfeats[:, None]), torch.from_numpy(blabels), ref_nc
            )
            t3_terms = criterion(
                t3[0], t3[1], torch.from_numpy(blabels), t3[2], t3[3], t3[4], t3[5]
            )
            t3_terms[0].backward()
            opt.step()
            ref_losses.append(float(t3_terms[0].detach()))
        np.testing.assert_allclose(losses, ref_losses, rtol=5e-4, atol=1e-5)
        out.update(flatten_tree(
            jax.tree_util.tree_map(np.asarray, tstate.trainable), "steps/after3"
        ))
        out["steps/bn_mean"] = np.asarray(tstate.bn_state.mean)
        out["steps/bn_var"] = np.asarray(tstate.bn_state.var)

        np.savez_compressed(GOLDEN_DIR / "tiny_pipeline.npz", **out)
        szs = {
            f.name: f.stat().st_size // 1024
            for f in (GOLDEN_DIR / "tiny_state.npz", GOLDEN_DIR / "tiny_pipeline.npz")
        }
        print(f"tiny fixtures written: {szs} KiB; "
              f"AUC={det['auc_roc']:.4f} losses={losses}")
    # keep torch referenced so linters don't drop the import used by helpers
    del torch


# ---------------------------------------------------------------------------
# metrics.npz
# ---------------------------------------------------------------------------


def gen_metrics() -> None:
    from sklearn.metrics import average_precision_score, roc_auc_score

    from anomalyclip_tpu.eval.metrics import detection_metrics

    rng = np.random.default_rng(5)
    t, num_classes, normal_id = 4096, 7, 4
    labels = rng.integers(0, num_classes, size=t).astype(np.int64)
    is_abn = labels != normal_id
    # scores correlated with the binary label so the curves are non-degenerate
    scores = np.clip(
        rng.normal(0.35 + 0.3 * is_abn, 0.25), 0.0, 1.0
    ).astype(np.float32)
    raw = rng.standard_normal((t, num_classes - 1)).astype(np.float32)
    raw[np.arange(t), np.minimum(labels, num_classes - 2)] += 1.0
    e = np.exp(raw - raw.max(axis=1, keepdims=True))
    class_probs = (e / e.sum(axis=1, keepdims=True)) * scores[:, None]

    det = detection_metrics(scores, labels, class_probs, normal_id, num_classes)

    # gen-time verification vs scikit-learn
    np.testing.assert_allclose(
        det["auc_roc"], roc_auc_score(is_abn, scores), atol=1e-10
    )
    np.testing.assert_allclose(
        det["auc_pr"], average_precision_score(is_abn, scores), atol=1e-10
    )
    per_cls = [
        roc_auc_score(labels == c, det["class_probs_full"][:, c])
        for c in range(num_classes) if c != normal_id and np.any(labels == c)
    ]
    np.testing.assert_allclose(det["mean_mc_auroc"], np.mean(per_cls), atol=1e-10)

    np.savez_compressed(
        GOLDEN_DIR / "metrics.npz",
        scores=scores,
        labels=labels,
        class_probs=class_probs,
        normal_id=np.asarray(normal_id),
        num_classes=np.asarray(num_classes),
        expected=np.asarray(
            [det["auc_roc"], det["auc_pr"], det["mean_mc_auroc"],
             det["mean_mc_aupr"], det["optimal_threshold"]]
        ),
        mc_auroc=np.asarray(det["mc_auroc"]),
        mc_aupr=np.asarray(det["mc_aupr"]),
    )
    print(f"metrics.npz: AUC={det['auc_roc']:.6f} AP={det['auc_pr']:.6f} "
          "(sklearn-verified)")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    choices=["tokenizer", "clip_b16", "tiny", "metrics"])
    ap.add_argument("--skip-oracle-check", action="store_true")
    args = ap.parse_args(argv)
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    wanted = args.only or ["tokenizer", "clip_b16", "tiny", "metrics"]
    if "tokenizer" in wanted:
        gen_tokenizer()
    if "clip_b16" in wanted:
        gen_clip_b16()
    if "tiny" in wanted:
        gen_tiny(args.skip_oracle_check)
    if "metrics" in wanted:
        gen_metrics()


if __name__ == "__main__":
    main()
