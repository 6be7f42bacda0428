"""Multi-device data parallelism on the 8-device virtual CPU mesh.

The TPU analogue of the reference's ddp_spawn CPU simulation test
(reference: tests/test_train.py:51-60). Verifies:
- the sharded train step runs and matches the single-device step numerically
  (global loss, global BN statistics — the sync_batchnorm equivalent),
- the driver-facing dryrun_multichip entry works.
"""

import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _graft_entry():
    spec = importlib.util.spec_from_file_location("graft_entry", REPO / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny_build():
    """One tiny model build shared by the in-process tests (the subprocess
    dryrun builds its own): model, frozen, trainable, bn_state."""
    return _graft_entry()._build_tiny()


def test_dryrun_multichip_8():
    _graft_entry().dryrun_multichip(8)


def test_sharded_step_matches_single_device(tiny_build):
    """Same batch, 1-device vs 8-device mesh: loss and updated BN stats agree."""
    from jax.sharding import NamedSharding, PartitionSpec

    from anomalyclip_tpu.data.loader import TrainBatch
    from anomalyclip_tpu.models.losses import LossConfig, compute_loss
    from anomalyclip_tpu.parallel.mesh import data_mesh

    model, frozen, trainable, bn_state = tiny_build
    n, l, d = 8, 4, model.embedding_dim
    half = 8
    loss_cfg = LossConfig(normal_id=2, num_topk=2, frames_per_segment=l, num_segments=n)

    rng = np.random.default_rng(0)
    abn = rng.standard_normal((half, n * l, d)).astype(np.float32)
    nor = rng.standard_normal((half, n * l, d)).astype(np.float32)
    abn_l = np.resize(np.array([0, 1, 3], np.int32), half)
    nor_l = np.full(half, 2, np.int32)
    key = jax.random.PRNGKey(0)

    def step(batch):
        feats = jnp.concatenate([batch.abnormal_features, batch.normal_features], 0)
        labels = jnp.concatenate([batch.abnormal_labels, batch.normal_labels], 0)
        out, new_bn = model.forward_train(
            frozen, trainable, bn_state, feats, labels, jnp.zeros(d), key
        )
        terms = compute_loss(
            out.logits, out.logits_topk, labels, out.scores,
            out.idx_topk_abn, out.idx_topk_nor, out.idx_bottomk_abn, loss_cfg,
        )
        return terms.total, new_bn

    # single device
    batch1 = TrainBatch(jnp.asarray(abn), jnp.asarray(abn_l), jnp.asarray(nor), jnp.asarray(nor_l))
    loss1, bn1 = jax.jit(step)(batch1)

    # 8-device mesh, halves sharded
    mesh = data_mesh(jax.devices()[:8])
    sh = NamedSharding(mesh, PartitionSpec("data"))
    batch8 = TrainBatch(
        jax.device_put(jnp.asarray(abn), sh),
        jax.device_put(jnp.asarray(abn_l), sh),
        jax.device_put(jnp.asarray(nor), sh),
        jax.device_put(jnp.asarray(nor_l), sh),
    )
    loss8, bn8 = jax.jit(step)(batch8)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=2e-5)
    # BN statistics are global-batch statistics on both layouts (sync-BN semantics)
    np.testing.assert_allclose(np.asarray(bn1.mean), np.asarray(bn8.mean), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bn1.var), np.asarray(bn8.var), rtol=2e-5, atol=1e-6)


def test_dp_grid_scorer_matches_single_device(tiny_build):
    """The production DP-eval path: GridScorer(mesh=8-device) must reproduce
    the single-device scorer exactly — validation on a pod shards grids over
    all chips through the SAME executable (evaluator.py GridScorer.mesh)."""
    from anomalyclip_tpu.eval.evaluator import GridScorer
    from anomalyclip_tpu.parallel.mesh import data_mesh

    model, frozen, trainable, bn_state = tiny_build
    rng = np.random.default_rng(1)
    nc = rng.standard_normal(model.embedding_dim).astype(np.float32)

    s1 = GridScorer(model, frozen, trainable, bn_state, nc)
    s8 = GridScorer(
        model, frozen, trainable, bn_state, nc, mesh=data_mesh(jax.devices()[:8])
    )
    # bucket table must stay divisible by the mesh
    assert all(b % 8 == 0 for b in s8.buckets), s8.buckets

    n, l, d = model.cfg.num_segments, model.cfg.seg_length, model.embedding_dim
    for g in (1, 9, 16):  # below one-per-device, odd over, exact multiple
        grids = rng.standard_normal((g, n, l, d)).astype(np.float32)
        sim1, sc1 = s1.score_grids(grids)
        sim8, sc8 = s8.score_grids(grids)
        np.testing.assert_allclose(sim8, sim1, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(sc8, sc1, rtol=1e-5, atol=1e-5)


def test_entry_builds():
    """entry() returns a jittable fn + args; trace it abstractly (no full compile:
    the flagship ViT-B/16 compile is exercised by the driver on real hardware)."""
    ge = _graft_entry()
    fn, args = ge.entry()
    jaxpr = jax.make_jaxpr(fn)(*args)
    assert jaxpr is not None
