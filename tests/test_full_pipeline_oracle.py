"""Full-pipeline oracle parity: the reference's COMPLETE torch pipeline vs ours.

Every numerical component already has an isolated torch-parity test; this module
closes the composition gap by running the *reference's own composed code* —
`src.models.components.anomaly_clip.AnomalyCLIP` with its real PromptLearner /
TextEncoder / SelectorModel / TemporalModel submodules (anomaly_clip.py:18-233),
the reference feature dataset (feature_dataset.py:124-383), the ncentroid
bootstrap (anomaly_clip_module.py:147-170), and the test_step composition
(anomaly_clip_module.py:459-498) — end-to-end on the same synthetic corpus and
the same converted weights as the JAX pipeline, and asserting:

  (a) training forward: the full 6-tuple, the updated BN statistics, and the
      composed 7-term loss match (anomaly_clip.py:156-215, loss.py:51-195);
  (b) test forward: per-video (similarity, scores) and the joint class_probs
      match after padding trim (anomaly_clip.py:117-154);
  (c) the eval epoch: identical concatenated score arrays and identical
      detection metrics (AUC/AP/mAUC/mAP) on the same videos
      (anomaly_clip_module.py:500-592);
  (d) the from-frames branches (load_from_features=False): raw pixel tensors
      through CLIP-visual encoding and the "(b ncrops n [s] l) d" rearranges
      into the same pipeline, train and test mode (anomaly_clip.py:117-131,
      156-169);
  (e) optimization: three full train steps (forward, loss, backward, AdamW
      with the reference's per-group LRs) yield the same per-step losses and
      the same updated weights (anomaly_clip_module.py:203-244, 693-746).

Weights flow reference -> JAX through the production converter
(convert_ckpt.convert_lightning_checkpoint via module.load_state), so this also
exercises the released-checkpoint path at full fidelity.

The selector's segment-dropout is the single stochastic train-forward component
(selector_model.py:101-117); both frameworks draw Bernoulli masks from their own
RNGs, so the experiment overrides dropout to 0 (keep-prob 1 => deterministic
all-keep masks on both sides). Everything else is exact math.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.helpers import full_oracle as fo  # noqa: E402
from tests.helpers.reference_oracle import reference_available  # noqa: E402
from tests.helpers.synthetic_run import synthetic_cfg  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Shared setup: synthetic corpus + JAX module + reference net + converted
    checkpoint, built once (the eval epoch alone is ~100 torch axial forwards)."""
    tmp_path = tmp_path_factory.mktemp("full_oracle")
    cfg = synthetic_cfg(
        tmp_path,
        "model.net.select_idx_dropout_topk=0.0",
        "model.net.select_idx_dropout_bottomk=0.0",
        "data.num_workers=0",
    )

    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    module = AnomalyCLIPTrainModule(cfg)  # generates the corpus on disk

    # The reference net over the same config block (tiny CLIP = CLIPConfig.tiny()).
    net_cfg = {
        k: v
        for k, v in dict(cfg.model.net).items()
        if k not in ("clip_init", "clip_ckpt_path", "compute_dtype")
    }
    net = fo.build_reference_net(net_cfg, clip_seed=7)
    # Non-trivial BN running stats so the eval-mode BN path is exercised for real
    # (fresh stats are mean=0/var=1, which would hide axis mix-ups).
    g = torch.Generator().manual_seed(11)
    bn = net.selector_model.bn_layer
    bn.running_mean.copy_(0.3 * torch.randn(bn.running_mean.shape, generator=g))
    bn.running_var.copy_(0.5 + torch.rand(bn.running_var.shape, generator=g))

    ckpt = fo.lightning_checkpoint_from_net(net, tmp_path / "oracle.ckpt")
    state = module.load_state(str(ckpt))

    _, feature_dataset_mod = fo.load_reference_pipeline()
    return {
        "cfg": cfg,
        "module": module,
        "state": state,
        "net": net,
        "feature_dataset_mod": feature_dataset_mod,
        "data_cfg": dict(cfg.data),
    }


@pytest.fixture(scope="module")
def ncentroids(pipeline):
    """(reference ncentroid, ours) — the bootstrap pass on both sides."""
    ref_ds = fo.reference_normal_test_mode_dataset(
        pipeline["data_cfg"], pipeline["feature_dataset_mod"]
    )
    ref_nc = fo.reference_ncentroid(ref_ds, pipeline["net"].embedding_dim)
    ours = pipeline["module"].compute_ncentroid()
    return ref_nc, np.asarray(ours)


def test_ncentroid_bootstrap_matches(ncentroids):
    """Mean-of-unpadded-normal-frames parity (anomaly_clip_module.py:147-170)."""
    ref_nc, ours = ncentroids
    np.testing.assert_allclose(ours, ref_nc.numpy(), rtol=1e-5, atol=1e-5)


def test_train_forward_and_loss_match(pipeline, ncentroids):
    """(a) full train forward: 6-tuple + BN update + composed loss
    (anomaly_clip.py:156-215, selector_model.py:71-99, loss.py:51-195)."""
    cfg = pipeline["cfg"]
    module = pipeline["module"]
    net = pipeline["net"]
    ref_nc, _ = ncentroids
    n = int(cfg.model.net.num_segments)
    l = int(cfg.model.net.seg_length)
    normal_id = int(cfg.data.normal_id)
    d = net.embedding_dim
    b = 8  # 4 abnormal + 4 normal (abnormal-first, anomaly_clip_module.py:177)

    rng = np.random.default_rng(123)
    feats = rng.standard_normal((b, 1, n * l, d)).astype(np.float32)
    abn_classes = [c for c in range(int(cfg.data.num_classes)) if c != normal_id]
    labels = np.array(
        [abn_classes[i % len(abn_classes)] for i in range(b // 2)]
        + [normal_id] * (b // 2),
        dtype=np.int64,
    )

    # --- reference forward (train mode: BN uses batch stats and updates) ------
    import copy

    tnet = copy.deepcopy(net).train()
    with torch.no_grad():
        t_out = tnet(
            torch.from_numpy(feats),
            torch.from_numpy(labels),
            ref_nc,
        )
    t_logits, t_logits_topk, t_scores, t_ita, t_itn, t_iba = t_out

    # --- ours ----------------------------------------------------------------
    state = pipeline["state"]
    out, new_bn = module.model.forward_train(
        module.frozen,
        state.trainable,
        state.bn_state,
        jnp.asarray(feats[:, 0]),  # (b, t, d): crops dim squeezed (ncrops=1)
        jnp.asarray(labels),
        jnp.asarray(ref_nc.numpy()),
        jax.random.PRNGKey(0),  # dropout=0 => key-independent
    )

    np.testing.assert_allclose(
        np.asarray(out.logits), t_logits.numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.logits_topk), t_logits_topk.numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.scores), t_scores.numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(out.idx_topk_abn), t_ita.numpy())
    np.testing.assert_array_equal(np.asarray(out.idx_topk_nor), t_itn.numpy())
    np.testing.assert_array_equal(np.asarray(out.idx_bottomk_abn), t_iba.numpy())

    # BN running-stat update parity (train-mode batch stats, momentum 0.1)
    tbn = tnet.selector_model.bn_layer
    np.testing.assert_allclose(
        np.asarray(new_bn.mean), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_bn.var), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )

    # --- composed loss on each side's own forward outputs ---------------------
    from tests.helpers.reference_oracle import load_reference_loss

    from anomalyclip_tpu.models.losses import compute_loss

    ref_loss_mod = load_reference_loss()
    loss_kwargs = {
        k: v
        for k, v in dict(cfg.model.loss).items()
        if k
        in (
            "normal_id",
            "num_topk",
            "lambda_dir_abn",
            "lambda_dir_nor",
            "lambda_topk_abn",
            "lambda_bottomk_abn",
            "lambda_topk_nor",
            "lambda_smooth",
            "lambda_sparse",
            "frames_per_segment",
            "num_segments",
        )
    }
    ref_terms = ref_loss_mod.ComputeLoss(**loss_kwargs)(
        t_logits, t_logits_topk, torch.from_numpy(labels), t_scores, t_ita, t_itn, t_iba
    )
    terms = compute_loss(
        out.logits,
        out.logits_topk,
        jnp.asarray(labels),
        out.scores,
        out.idx_topk_abn,
        out.idx_topk_nor,
        out.idx_bottomk_abn,
        module.loss_cfg,
    )
    for ours_t, ref_t, name in zip(
        terms,
        ref_terms,
        ("total", "ldir_abn", "ldir_nor", "ltopk_abn", "lbottomk_abn", "ltopk_nor",
         "lsmooth", "lsparse"),
    ):
        np.testing.assert_allclose(
            np.asarray(ours_t), float(ref_t), rtol=2e-4, atol=1e-5, err_msg=name
        )


@pytest.fixture(scope="module")
def eval_outputs(pipeline, ncentroids):
    """Both eval epochs over the identical synthetic test set."""
    ref_nc, our_nc = ncentroids
    module = pipeline["module"]
    ref_ds = fo.reference_test_dataset(
        pipeline["data_cfg"], pipeline["feature_dataset_mod"]
    )
    ref = fo.reference_eval_epoch(pipeline["net"], ref_ds, ref_nc)

    from anomalyclip_tpu.eval.evaluator import evaluate_videos

    module.ncentroid = our_nc
    scorer = module._scorer(pipeline["state"])
    ours = evaluate_videos(
        module.datamodule.test_dataloader(), scorer, module.model
    )
    return ref, ours


def test_eval_epoch_outputs_match(eval_outputs):
    """(b)+(c) concatenated per-frame outputs: scores, labels, joint class
    probabilities (anomaly_clip_module.py:459-504)."""
    ref, ours = eval_outputs
    assert ours["abnormal_scores"].shape == ref["abnormal_scores"].shape
    np.testing.assert_array_equal(ours["labels"], ref["labels"])
    np.testing.assert_allclose(
        ours["abnormal_scores"], ref["abnormal_scores"], rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        ours["class_probs"], ref["class_probs"], rtol=1e-4, atol=2e-5
    )


@pytest.fixture(scope="module")
def frames_pipeline(pipeline):
    """Both nets re-instantiated in from-frames mode (load_from_features=False)
    over the SAME weights as the features-mode pipeline: the reference branches
    at forward time (anomaly_clip.py:117-131, 156-169), encoding raw frames
    with clip_model.visual and rearranging "(b ncrops n s l) d"; ours branches
    in forward_train/forward_test via encode_frames. PIL decode + preprocess
    parity is pinned separately (tests/test_data.py, tests/test_transforms.py);
    these tests close the frames->encoder->grid COMPOSITION gap on identical
    already-preprocessed pixel tensors."""
    import copy
    import dataclasses

    from anomalyclip_tpu.models.anomaly_clip import AnomalyCLIP

    cfg = pipeline["cfg"]
    net_cfg = {
        k: v
        for k, v in dict(cfg.model.net).items()
        if k not in ("clip_init", "clip_ckpt_path", "compute_dtype")
    }
    net_cfg["load_from_features"] = False
    ref_net = fo.build_reference_net(net_cfg, clip_seed=7)
    ref_net.load_state_dict(copy.deepcopy(pipeline["net"].state_dict()))
    ref_net.eval()

    m = pipeline["module"].model
    model = AnomalyCLIP(
        dataclasses.replace(m.cfg, load_from_features=False),
        m.clip_cfg,
        m.classnames,
        m.prompt_spec,
    )
    return {"ref_net": ref_net, "model": model}


def _random_frames(rng, b, t, side):
    """Identical 'preprocessed' pixels for both frameworks: torch NCHW float32
    and the same frames as NHWC for ours."""
    nchw = rng.standard_normal((b, t, 3, side, side)).astype(np.float32)
    nhwc = np.ascontiguousarray(np.transpose(nchw, (0, 1, 3, 4, 2)))
    return nchw, nhwc


def test_from_frames_test_forward_matches(pipeline, frames_pipeline, ncentroids):
    """From-frames test forward: CLIP-encode all T frames, rearrange
    "(b ncrops n s l) d", selector + temporal + stride expansion
    (anomaly_clip.py:117-154) — per-frame (similarity, scores) parity."""
    cfg = pipeline["cfg"]
    ref_nc, _ = ncentroids
    n = int(cfg.model.net.num_segments)
    l = int(cfg.model.net.seg_length)
    side = frames_pipeline["model"].clip_cfg.image_resolution
    segment_size = 2
    t = n * segment_size * l  # ncrops=1

    nchw, nhwc = _random_frames(np.random.default_rng(21), 1, t, side)
    with torch.no_grad():
        ref_sim, ref_scores = frames_pipeline["ref_net"](
            torch.from_numpy(nchw),
            torch.zeros(t, dtype=torch.long),  # labels: unused in test mode
            ref_nc,
            segment_size,
            test_mode=True,
        )

    state = pipeline["state"]
    sim, scores = frames_pipeline["model"].forward_test(
        pipeline["module"].frozen,
        state.trainable,
        state.bn_state,
        jnp.asarray(nhwc),
        jnp.asarray(ref_nc.numpy()),
        segment_size,
    )
    np.testing.assert_allclose(
        np.asarray(sim), ref_sim.numpy(), rtol=1e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(scores), ref_scores.numpy(), rtol=1e-4, atol=5e-5
    )


def test_from_frames_train_forward_matches(pipeline, frames_pipeline, ncentroids):
    """From-frames training forward: encode + "(b ncrops n l) d" rearrange into
    the selector/temporal pipeline (anomaly_clip.py:156-215) — full 6-tuple
    parity (dropout=0 in this experiment => deterministic selection)."""
    import copy

    cfg = pipeline["cfg"]
    ref_nc, _ = ncentroids
    n = int(cfg.model.net.num_segments)
    l = int(cfg.model.net.seg_length)
    side = frames_pipeline["model"].clip_cfg.image_resolution
    normal_id = int(cfg.data.normal_id)
    b = 4  # 2 abnormal + 2 normal, abnormal-first (anomaly_clip_module.py:177)

    nchw, nhwc = _random_frames(np.random.default_rng(22), b, n * l, side)
    abn = [c for c in range(int(cfg.data.num_classes)) if c != normal_id]
    labels = np.array(abn[: b // 2] + [normal_id] * (b // 2), dtype=np.int64)

    tnet = copy.deepcopy(frames_pipeline["ref_net"]).train()
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(nchw), torch.from_numpy(labels), ref_nc)
    t_logits, t_logits_topk, t_scores, t_ita, t_itn, t_iba = t_out

    state = pipeline["state"]
    out, _new_bn = frames_pipeline["model"].forward_train(
        pipeline["module"].frozen,
        state.trainable,
        state.bn_state,
        jnp.asarray(nhwc),
        jnp.asarray(labels),
        jnp.asarray(ref_nc.numpy()),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), t_logits.numpy(), rtol=1e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.logits_topk), t_logits_topk.numpy(), rtol=1e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.scores), t_scores.numpy(), rtol=1e-4, atol=5e-5
    )
    np.testing.assert_array_equal(np.asarray(out.idx_topk_abn), t_ita.numpy())
    np.testing.assert_array_equal(np.asarray(out.idx_topk_nor), t_itn.numpy())
    np.testing.assert_array_equal(np.asarray(out.idx_bottomk_abn), t_iba.numpy())


@pytest.mark.parametrize("position", ["middle", "front"])
def test_class_token_positions_match_reference(pipeline, position):
    """The "middle"/"front" prompt orderings (reference coop.py:92-133) — our
    static per-class row-permutation assembly vs the reference's per-class
    concat loop, on the reference's own ctx/prefix/suffix."""
    import jax.numpy as jnp

    from anomalyclip_tpu.models.prompt_learner import (
        assemble_prompts,
        build_prompt_spec,
    )

    net = pipeline["net"]
    pl_ = net.prompt_learner
    pl_.class_token_position = position
    try:
        with torch.no_grad():
            want = pl_().numpy()
    finally:
        pl_.class_token_position = "end"

    module = pipeline["module"]
    spec = build_prompt_spec(
        module.model.classnames,
        np.asarray(module.frozen["clip"]["text"]["token_embedding"]),
        n_ctx=int(pipeline["cfg"].model.net.n_ctx),
        class_token_position=position,
    )
    got = np.asarray(assemble_prompts(jnp.asarray(pl_.ctx.detach().numpy()), spec))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_encode_text_matches_reference_zeroshot(pipeline):
    """encode_text == the reference's TextEncoderZeroshot (text_encoder.py:28-50)
    on raw token ids through the converted CLIP weights."""
    import importlib

    import jax.numpy as jnp

    from anomalyclip_tpu.models.clip.model import encode_text
    from anomalyclip_tpu.models.clip.tokenizer import tokenize

    te_mod = importlib.import_module("src.models.components.text_encoder")
    clip_pkg = __import__("sys").modules["src.models.components.clip.clip"]
    texts = ["a video of fire", "an empty street at night"]
    tokens = tokenize(texts)

    net = pipeline["net"]

    class _ClipShim:  # TextEncoderZeroshot pulls submodules off a CLIP instance
        token_embedding = net.token_embedding
        transformer = net.text_encoder.transformer
        positional_embedding = net.text_encoder.positional_embedding
        ln_final = net.text_encoder.ln_final
        text_projection = net.text_encoder.text_projection
        dtype = torch.float32

    zeroshot = te_mod.TextEncoderZeroshot(_ClipShim)
    with torch.no_grad():
        ref_tokens = clip_pkg.tokenize(texts)
        np.testing.assert_array_equal(tokens, ref_tokens.numpy())
        want = zeroshot(ref_tokens).numpy()

    module = pipeline["module"]
    got = np.asarray(
        encode_text(module.frozen["clip"], module.model.clip_cfg, jnp.asarray(tokens))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("t,length", [(100, 32), (32, 32), (7, 32), (333, 31)])
def test_process_feat_matches_reference(pipeline, monkeypatch, t, length):
    """The mean-pooling resampler (feature_dataset.py:30-39) — vectorized
    reduceat vs the reference loop (np.int patched: removed in modern numpy)."""
    from anomalyclip_tpu.data.sampling import process_feat

    monkeypatch.setattr(np, "int", np.int64, raising=False)
    ref_fn = pipeline["feature_dataset_mod"].process_feat
    feat = np.random.default_rng(3).standard_normal((t, 16)).astype(np.float32)
    np.testing.assert_allclose(
        process_feat(feat, length), ref_fn(feat, length), rtol=1e-6, atol=1e-6
    )


@pytest.mark.slow
def test_multi_step_training_updates_match(pipeline, ncentroids, tmp_path):
    """(e) OPTIMIZATION parity: three full train steps — forward, 7-term loss,
    backward, AdamW update with the reference's per-group LRs, BN running-stat
    evolution — produce the same per-step losses and the same updated weights
    on both frameworks (anomaly_clip_module.py:203-244 training_step,
    693-746 configure_optimizers; our side runs the production jitted
    train_step + optax optimizer, train/module.py:_build_train_step +
    train/optim.py:build_optimizer).

    Step-k losses depend on step-(k-1)'s updated parameters, so agreement over
    three steps pins the entire gradient + optimizer chain, not one forward.
    Warmup is disabled on both sides (the reference's epoch-0 warmup LR is 0,
    which would make every update a no-op); updated torch weights flow back
    through the production converter for the final tree-wide comparison."""
    import copy

    from anomalyclip_tpu.train.module import TrainState
    from anomalyclip_tpu.train.optim import build_optimizer
    from tests.helpers.reference_oracle import load_reference_loss

    cfg = pipeline["cfg"]
    module = pipeline["module"]
    net = pipeline["net"]
    ref_nc, _ = ncentroids
    n = int(cfg.model.net.num_segments)
    l = int(cfg.model.net.seg_length)
    normal_id = int(cfg.data.normal_id)
    d = net.embedding_dim
    half = 4
    solver = dict(cfg.model.solver)
    base_lr = 1e-3  # large enough that 3 steps move weights well above fp32 noise
    opt_cfg = dict(cfg.model.get("optimizer", {}))
    wd = float(opt_cfg.get("weight_decay", 0.2))

    rng = np.random.default_rng(77)
    abn_classes = [c for c in range(int(cfg.data.num_classes)) if c != normal_id]
    batches = []
    for k in range(3):
        feats = rng.standard_normal((2 * half, n * l, d)).astype(np.float32)
        labels = np.array(
            [abn_classes[(k + i) % len(abn_classes)] for i in range(half)]
            + [normal_id] * half,
            dtype=np.int64,
        )
        batches.append((feats, labels))

    # --- torch: the reference's optimizer over the reference's composed net ----
    tnet = copy.deepcopy(net).train()
    for p in tnet.image_encoder.parameters():
        p.requires_grad_(False)
    for p in tnet.text_encoder.parameters():
        p.requires_grad_(False)
    tnet.text_encoder.text_projection.requires_grad_(True)
    for p in tnet.token_embedding.parameters():
        p.requires_grad_(False)
    groups = [  # the four groups of configure_optimizers, same order/ratios
        {"params": list(tnet.selector_model.parameters()),
         "lr": base_lr * float(solver.get("selector_model_ratio", 1))},
        {"params": list(tnet.temporal_model.parameters()),
         "lr": base_lr * float(solver.get("temporal_model_ratio", 1))},
        {"params": list(tnet.prompt_learner.parameters()),
         "lr": base_lr * float(solver.get("prompt_learner_ratio", 1))},
        {"params": [tnet.text_encoder.text_projection],
         "lr": base_lr * float(solver.get("text_projection_ratio", 1))},
    ]
    opt = torch.optim.AdamW(groups, weight_decay=wd)

    loss_kwargs = {
        k: v
        for k, v in dict(cfg.model.loss).items()
        if k in ("normal_id", "num_topk", "lambda_dir_abn", "lambda_dir_nor",
                 "lambda_topk_abn", "lambda_bottomk_abn", "lambda_topk_nor",
                 "lambda_smooth", "lambda_sparse", "frames_per_segment",
                 "num_segments")
    }
    criterion = load_reference_loss().ComputeLoss(**loss_kwargs)

    ref_losses = []
    for feats, labels in batches:
        opt.zero_grad()
        t_out = tnet(
            torch.from_numpy(feats[:, None]),  # (b, ncrops=1, t, d)
            torch.from_numpy(labels),
            ref_nc,
        )
        terms = criterion(
            t_out[0], t_out[1], torch.from_numpy(labels), t_out[2],
            t_out[3], t_out[4], t_out[5],
        )
        terms[0].backward()
        opt.step()
        ref_losses.append(float(terms[0].detach()))

    # --- ours: the production train step + optimizer, warmup disabled ----------
    from anomalyclip_tpu.data.loader import TrainBatch

    solver_ours = dict(solver)
    solver_ours["lr"] = base_lr
    sched = dict(cfg.model.get("scheduler", {}))
    sched["warmup_epochs"] = 0
    tx = build_optimizer(solver_ours, opt_cfg, sched, steps_per_epoch=1000)
    state = TrainState(
        trainable=pipeline["state"].trainable,
        opt_state=tx.init(pipeline["state"].trainable),
        bn_state=pipeline["state"].bn_state,
        step=jnp.zeros((), jnp.int32),
    )
    train_step = module._build_train_step(tx)

    our_losses = []
    for feats, labels in batches:
        batch = TrainBatch(
            abnormal_features=feats[:half],
            abnormal_labels=labels[:half],
            normal_features=feats[half:],
            normal_labels=labels[half:],
        )
        sums = module._zero_metric_sums()
        state, sums = train_step(
            module.frozen, state, batch, jnp.asarray(ref_nc.numpy()),
            jax.random.PRNGKey(0), sums,
        )
        our_losses.append(float(sums["train/loss"]))

    # per-step losses: steps 2 and 3 see the previous updates on both sides
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-4, atol=1e-5)
    assert abs(our_losses[0] - our_losses[-1]) > 1e-4, "optimizer did nothing"

    # updated weights: push the trained torch net through the production
    # converter and compare the entire trainable tree + BN running stats
    ckpt = fo.lightning_checkpoint_from_net(tnet, tmp_path / "after3.ckpt")
    ref_state = module.load_state(str(ckpt))

    flat_ours = jax.tree_util.tree_leaves_with_path(state.trainable)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_state.trainable))
    assert len(flat_ours) == len(flat_ref)
    # Tolerance note: Adam normalizes updates by sqrt(v̂)+eps, so where the
    # true gradient of an element is ~0 the update direction is the SIGN of
    # fp32 rounding noise — a framework-disagreeing element legitimately moves
    # up to lr per step regardless of gradient magnitude. Observed: ~1e-5 of
    # elements off by up to ~0.6*lr after 3 steps, everything else exact.
    # Assert two tiers: every element within ~1.5 lr of drift, and >=99.9%
    # at tight fp32 tolerance.
    for path, leaf in flat_ours:
        ours_a = np.asarray(leaf)
        ref_a = np.asarray(flat_ref[path])
        name = jax.tree_util.keystr(path)
        diff = np.abs(ours_a - ref_a)
        np.testing.assert_array_less(diff.max(), 1.5 * base_lr, err_msg=name)
        tight = diff <= 5e-5 + 1e-3 * np.abs(ref_a)
        assert tight.mean() >= 0.999, (name, float(1 - tight.mean()))
    np.testing.assert_allclose(
        np.asarray(state.bn_state.mean), np.asarray(ref_state.bn_state.mean),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state.bn_state.var), np.asarray(ref_state.bn_state.var),
        rtol=1e-5, atol=1e-6,
    )


def test_eval_epoch_metrics_match(eval_outputs, pipeline):
    """(c) identical detection metrics from each side's own arrays
    (anomaly_clip_module.py:500-592)."""
    ref, ours = eval_outputs
    from anomalyclip_tpu.eval.metrics import detection_metrics

    normal_id = int(pipeline["cfg"].data.normal_id)
    num_classes = int(pipeline["cfg"].data.num_classes)
    det_ref = detection_metrics(
        ref["abnormal_scores"], ref["labels"], ref["class_probs"],
        normal_id, num_classes,
    )
    det_ours = detection_metrics(
        ours["abnormal_scores"], ours["labels"], ours["class_probs"],
        normal_id, num_classes,
    )
    for key in ("auc_roc", "auc_pr", "mean_mc_auroc", "mean_mc_aupr",
                "optimal_threshold"):
        assert det_ours[key] == pytest.approx(det_ref[key], abs=1e-4), key
