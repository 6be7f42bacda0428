"""Config-composition schema tests (reference shape: tests/test_configs.py:6-29)."""

from pathlib import Path

import pytest

from anomalyclip_tpu.config import compose

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"

EXPERIMENTS = ["ucfcrime", "shanghaitech", "xdviolence", "synthetic"]


@pytest.mark.parametrize("experiment", EXPERIMENTS)
def test_experiment_composes(experiment, monkeypatch, tmp_path):
    monkeypatch.setenv("PROJECT_ROOT", str(CONFIG_DIR.parent))
    cfg = compose(CONFIG_DIR, "train", [f"experiment={experiment}"])
    assert cfg.exp_name == experiment
    assert cfg.data.num_classes == cfg.model.num_classes
    assert cfg.model.net.normal_id == cfg.data.normal_id
    assert cfg.model.loss.frames_per_segment == cfg.data.seg_length
    assert Path(cfg.data.labels_file).is_file()
    assert cfg.seed == 1024


def test_dataset_model_pairings():
    cfg = compose(CONFIG_DIR, "train", ["experiment=shanghaitech"])
    assert cfg.model.net.concat_features is True
    assert cfg.model.net.depth == 2
    assert cfg.model.solver.lr == pytest.approx(5e-4)

    cfg = compose(CONFIG_DIR, "train", ["experiment=xdviolence"])
    assert cfg.model.net.emb_size == 128
    assert cfg.data.normal_id == 4
    assert cfg.model.solver.lr == pytest.approx(5e-6)

    cfg = compose(CONFIG_DIR, "train", ["experiment=ucfcrime"])
    assert cfg.model.net.emb_size == 256
    assert cfg.data.num_classes == 14
    assert cfg.model.scheduler.warmup_epochs == 5


def test_cli_override_precedence():
    cfg = compose(
        CONFIG_DIR,
        "train",
        ["experiment=ucfcrime", "model.net.emb_size=64", "trainer.max_epochs=7", "seed=3"],
    )
    assert cfg.model.net.emb_size == 64
    assert cfg.trainer.max_epochs == 7
    assert cfg.seed == 3


def test_eval_root_composes():
    cfg = compose(
        CONFIG_DIR,
        "eval",
        ["data=ucfcrime", "model=anomaly_clip_ucfcrime", "ckpt_path=/tmp/ck"],
    )
    assert cfg.ckpt_path == "/tmp/ck"
    assert cfg.task_name == "eval"


def test_debug_bundles_override_experiment():
    cfg = compose(CONFIG_DIR, "train", ["experiment=synthetic", "debug=limit"])
    assert cfg.trainer.max_epochs == 3
    # reference fractions (configs/debug/limit.yaml): 1% train, 5% val/test
    assert cfg.trainer.limit_train_batches == 0.01
    assert cfg.trainer.limit_val_batches == 0.05
    cfg = compose(CONFIG_DIR, "train", ["experiment=synthetic", "debug=fdr"])
    assert cfg.trainer.fast_dev_run is True
    # debug bundles inherit debug/default: separate task dir, CPU, no callbacks
    assert cfg.task_name == "debug"
    assert cfg.trainer.accelerator == "cpu"
    assert cfg.get("callbacks") is None
    assert cfg.trainer.detect_anomaly is True


def test_reference_trainer_group_names_compose():
    """Every trainer group name a reference user might type resolves
    (reference: configs/trainer/{default,cpu,gpu,mps,ddp,ddp_sim}.yaml)."""
    from anomalyclip_tpu.config.compose import compose

    expect = {
        "ddp": ("tpu", "auto"),
        "ddp_sim": ("cpu", 2),
        "dp_sim": ("cpu", 2),
        "gpu": ("auto", 1),
        "mps": ("auto", 1),
        "cpu": ("cpu", 1),
        "tpu": ("tpu", "auto"),
    }
    for name, (acc, dev) in expect.items():
        cfg = compose(CONFIG_DIR, "train", ["experiment=synthetic", f"trainer={name}"])
        assert cfg["trainer"]["accelerator"] == acc, name
        assert cfg["trainer"]["devices"] == dev, name


@pytest.mark.parametrize(
    "experiment,bundle",
    [
        ("ucfcrime", "ucfcrime_tpe"),
        ("ucfcrime", "ucfcrime_random"),
        ("xdviolence", "xdviolence_tpe"),
        ("xdviolence", "xdviolence_random"),
        ("shanghaitech", "shanghaitech_tpe"),
        ("shanghaitech", "shanghaitech_random"),
        ("synthetic", "synthetic_tpe"),
        ("synthetic", "synthetic_random"),
    ],
)
def test_hparams_search_bundles_compose(experiment, bundle):
    """Every hparams_search bundle composes against its experiment, optimizes a
    metric the evaluator actually logs (XD-Violence's headline is AP -> auc_pr,
    SURVEY.md §6), and every search-space key resolves to a real node in the
    composed config (a typo'd dotted path would silently create a new key at
    trial-override time instead of tuning anything)."""
    cfg = compose(
        CONFIG_DIR, "train", [f"experiment={experiment}", f"hparams_search={bundle}"]
    )
    expected_metric = "auc_pr" if experiment == "xdviolence" else "auc_roc"
    assert cfg["optimized_metric"] == expected_metric
    hs = cfg["hparams_search"]
    assert hs["sampler"] in ("tpe", "random", "grid")
    assert int(hs["n_trials"]) >= 1
    space = hs["space"]
    assert space
    for dotted, spec in space.items():
        node = cfg
        for part in dotted.split("."):
            assert part in node, f"{bundle}: space key {dotted!r} missing at {part!r}"
            node = node[part]
        kind = spec.get("type", "choice")
        if kind == "choice":
            assert spec["values"]
        else:
            assert float(spec["low"]) < float(spec["high"])
