"""Serving CLI: persistent scorer over stdin-fed paths and a watched directory.

Outputs must be byte-identical to predict.py's for the same input, since both
route through predict.score_input and the evaluator's GridScorer.
"""

from __future__ import annotations

import io
import json
import shutil

import pytest

from tests.helpers.synthetic_run import synthetic_cfg


@pytest.mark.slow
def test_serve_stdin_and_watch(tmp_path, monkeypatch):
    from anomalyclip_tpu.predict import main as predict_main
    from anomalyclip_tpu.serve import main as serve_main
    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule

    cfg = synthetic_cfg(
        tmp_path,
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
        "trainer.limit_val_batches=1",
    )
    module = AnomalyCLIPTrainModule(cfg)
    module.fit()
    ckpt = module.save_dir / "checkpoints" / "last"
    froot = cfg["data"]["frames_root"]

    common = [
        "experiment=synthetic",
        f"data.frames_root={froot}",
        # keep both roots on the generated corpus (see test_predict.py)
        f"data.annotations_root={cfg['data']['annotations_root']}",
        f"ckpt_path={ckpt}",
    ]
    inputs = [f"{froot}/abnormal_000.npy", f"{froot}/normal_000.npy"]

    # --- stdin mode: one JSON per line-fed path -----------------------------
    out_dir = tmp_path / "served"
    monkeypatch.setattr("sys.stdin", io.StringIO("\n".join(inputs) + "\n"))
    rc = serve_main(common + [f"output_dir={out_dir}"])
    assert rc == 0
    served = {p.name: json.loads(p.read_text()) for p in out_dir.glob("*.json")}
    assert set(served) == {"abnormal_000.json", "normal_000.json"}

    # identical to predict on the same input
    pred_out = tmp_path / "pred.json"
    predict_main(common + [f"input={inputs[0]}", f"output={pred_out}"])
    want = json.loads(pred_out.read_text())
    # "input" differs only by Path normalization of the raw cfg string
    drop = lambda d: {k: v for k, v in d.items() if k != "input"}
    assert drop(served["abnormal_000.json"]) == drop(want)

    # a bad path must not kill the service, and good ones around it still score
    monkeypatch.setattr(
        "sys.stdin", io.StringIO(f"{tmp_path}/missing.npy\n{inputs[1]}\n")
    )
    out_dir2 = tmp_path / "served2"
    assert serve_main(common + [f"output_dir={out_dir2}"]) == 0
    assert [p.name for p in out_dir2.glob("*.json")] == ["normal_000.json"]

    # --- watch mode: scores files appearing in the directory ----------------
    watch_dir = tmp_path / "incoming"
    watch_dir.mkdir()
    shutil.copy(inputs[0], watch_dir / "cam_a.npy")
    import time

    time.sleep(0.3)  # let mtime settle past poll_interval
    out_dir3 = tmp_path / "served3"
    rc = serve_main(
        common
        + [
            f"watch={watch_dir}",
            "poll_interval=0.2",
            "stop_after=2",
            f"output_dir={out_dir3}",
        ]
    )
    assert rc == 0
    got = json.loads((out_dir3 / "cam_a.json").read_text())
    assert got["frame_scores"] == want["frame_scores"]
