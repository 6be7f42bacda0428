#!/usr/bin/env python
"""Released-checkpoint parity verification — the north-star closure command.

The reference evaluates its published weights (reference: README.md:72-76 ->
src/eval.py:33-89); BASELINE.md's parity target is "within 0.2 pts of the
reference's reproduced AUC/AP". This build environment has zero egress, so the
numbers cannot be measured here — this script is the ONE command that closes
the loop the day a host with egress (or pre-downloaded artifacts) runs it:

    python scripts/verify_released_ckpts.py --ckpt-dir checkpoints \
        [--allow-download] [-- data.frames_root=... any dotted overrides]

Per dataset it: locates (optionally downloads + SHA256-pins) the released
Lightning .ckpt, evaluates it through the production conversion + eval path
(eval_entry -> convert_ckpt -> GridScorer), compares the headline metric to
the pinned target, rewrites the parity table between the markers in
BASELINE.md, and exits nonzero if any dataset misses by more than 0.2 pts.

Offline dry-run (exercised by tests/test_verify_released.py): evaluates the
committed golden tiny fixture over the synthetic corpus through the exact same
locate -> eval -> table -> threshold machinery.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

# Released AnomalyCLIP checkpoints (reference README.md:72-76: one Google Drive
# bundle holding a `checkpoints/` folder with one .ckpt per dataset). The
# sha256 fields are None until the first verified download pins them — the
# script prints the computed hash so it can be committed here.
RELEASED_BUNDLE = {
    "gdrive_id": "1kgifxpoVn6EwZUIbZ0DbA8zI88aaVPV3",
    "sha256": None,
}

# dataset -> headline metric + parity target. "reproduced" is the number the
# reference's own src/eval.py prints for the released checkpoint (the real
# target; unmeasured until the first egress-enabled run pins it). "paper" is
# the arXiv 2310.02835 table value — provisional, quoted for orientation only.
DATASETS = {
    "shanghaitech": {"metric": "auc_roc", "reproduced": None, "paper": None},
    "ucfcrime": {"metric": "auc_roc", "reproduced": None, "paper": 0.8636},
    "xdviolence": {"metric": "auc_pr", "reproduced": None, "paper": 0.7851},
}
TOLERANCE_PTS = 0.2  # |ours - reproduced| in percentage points

BEGIN = "<!-- verify_released_ckpts:begin -->"
END = "<!-- verify_released_ckpts:end -->"


def find_checkpoint(ckpt_dir: Path, dataset: str) -> Path | None:
    if not ckpt_dir.is_dir():
        return None
    hits = sorted(
        p for p in ckpt_dir.rglob("*.ckpt") if dataset.lower() in p.name.lower()
    ) or sorted((ckpt_dir / dataset).rglob("*.ckpt") if (ckpt_dir / dataset).is_dir() else [])
    return hits[0] if hits else None


def download_bundle(ckpt_dir: Path, timeout: int = 120) -> None:
    """Fetch the released checkpoint bundle from Google Drive (zip with a
    `checkpoints/` folder) and unpack it under ``ckpt_dir``. Pins/verifies
    RELEASED_BUNDLE['sha256'] when set; prints the hash to commit otherwise."""
    import io
    import urllib.request
    import zipfile

    from anomalyclip_tpu.models.clip.registry import sha256_file

    url = (
        "https://drive.usercontent.google.com/download?id="
        f"{RELEASED_BUNDLE['gdrive_id']}&export=download&confirm=t"
    )
    print(f"downloading released checkpoint bundle: {url}")
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        blob = resp.read()
    tmp = ckpt_dir / "released_bundle.zip"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    tmp.write_bytes(blob)
    digest = sha256_file(tmp)
    if RELEASED_BUNDLE["sha256"] and digest != RELEASED_BUNDLE["sha256"]:
        tmp.unlink()
        raise RuntimeError(f"bundle SHA256 mismatch: got {digest}")
    if not RELEASED_BUNDLE["sha256"]:
        print(f"bundle sha256 (commit into RELEASED_BUNDLE to pin): {digest}")
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        zf.extractall(ckpt_dir)


def evaluate_checkpoint(dataset: str, ckpt: Path, overrides: list[str]) -> dict:
    """The production eval path: data/model groups + in-place .ckpt conversion
    (eval_entry.main -> module.load_state -> GridScorer buckets)."""
    from anomalyclip_tpu import eval_entry

    argv = [
        f"data={dataset}",
        f"model=anomaly_clip_{dataset}",
        f"ckpt_path={ckpt}",
        *overrides,
    ]
    return eval_entry.main(argv)


def write_table(baseline_md: Path, rows: list[dict]) -> None:
    """Rewrite the parity table between the BEGIN/END markers (appending the
    marked section if absent)."""
    lines = [
        BEGIN,
        "",
        "## Released-checkpoint parity (scripts/verify_released_ckpts.py)",
        "",
        "| Dataset | Metric | Ours | Target | Source | Δ (pts) | Within 0.2? |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        delta = "" if r["target"] is None else f"{abs(r['ours'] - r['target']) * 100:.3f}"
        verdict = "—" if r["target"] is None else ("yes" if r["ok"] else "**NO**")
        target = "unpinned" if r["target"] is None else f"{r['target']:.4f}"
        lines.append(
            f"| {r['dataset']} | {r['metric']} | {r['ours']:.4f} | {target} "
            f"| {r['target_source']} | {delta} | {verdict} |"
        )
    lines += ["", END]
    block = "\n".join(lines)
    text = baseline_md.read_text() if baseline_md.is_file() else "# BASELINE\n"
    if BEGIN in text and END in text:
        head, rest = text.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
        text = head + block + tail
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    baseline_md.write_text(text)


def run(datasets: dict, eval_fn, baseline_md: Path, strict_paper: bool = False) -> int:
    """Evaluate every dataset, rewrite the parity table, return the exit code.

    Only ``reproduced`` targets gate the exit code: BASELINE.md defines parity
    against the reference's REPRODUCED numbers, and the paper-table values are
    declared provisional (reproduced runs routinely differ from paper tables
    by more than the 0.2-pt tolerance). A paper-only miss is still printed and
    marked in the table; ``strict_paper`` opts it into the exit code."""
    rows, rc = [], 0
    for name, spec in datasets.items():
        metrics = eval_fn(name)
        ours = float(metrics[spec["metric"]])
        target = spec["reproduced"] if spec["reproduced"] is not None else spec["paper"]
        source = (
            "reproduced" if spec["reproduced"] is not None
            else ("paper (provisional)" if spec["paper"] is not None else "none")
        )
        ok = target is None or abs(ours - target) * 100 <= TOLERANCE_PTS
        if not ok and (source == "reproduced" or strict_paper):
            rc = 1
        rows.append(
            {"dataset": name, "metric": spec["metric"], "ours": ours,
             "target": target, "target_source": source, "ok": ok}
        )
        print(json.dumps(rows[-1]))
    write_table(baseline_md, rows)
    print(f"parity table written to {baseline_md}")
    return rc


def dry_run(tmp_root: Path, baseline_md: Path, perturb: float = 0.0) -> int:
    """Offline rehearsal: the golden tiny fixture evaluated over the synthetic
    corpus drives the same locate->eval->table->threshold machinery. ``perturb``
    shifts the pinned target to exercise the failure exit path in tests."""
    import numpy as np

    from anomalyclip_tpu.train.module import AnomalyCLIPTrainModule
    from anomalyclip_tpu.utils.treeio import unflatten_tree
    from tests.helpers.synthetic_run import synthetic_cfg

    overrides = (
        "model.net.select_idx_dropout_topk=0.0",
        "model.net.select_idx_dropout_bottomk=0.0",
        "model.net.emb_size=32",
        "data.num_workers=0",
    )
    cfg = synthetic_cfg(tmp_root, *overrides)
    module = AnomalyCLIPTrainModule(cfg)

    golden_dir = REPO_ROOT / "tests" / "golden"
    with np.load(golden_dir / "tiny_state.npz") as data:
        flat = {k: data[k] for k in data.files}
    with np.load(golden_dir / "tiny_pipeline.npz") as data:
        expected_auc = float(data["eval/metrics"][0])

    from anomalyclip_tpu.models.clip.model import CLIPConfig
    from anomalyclip_tpu.models.selector import BNState

    frozen = unflatten_tree(
        {k[len("frozen/"):]: v for k, v in flat.items() if k.startswith("frozen/")}
    )
    trainable = unflatten_tree(
        {k[len("trainable/"):]: v for k, v in flat.items() if k.startswith("trainable/")}
    )
    clip_cfg = CLIPConfig(**{
        f: int(flat[f"clip_cfg/{f}"])
        for f in ("embed_dim", "image_resolution", "vision_layers", "vision_width",
                  "vision_patch_size", "context_length", "vocab_size",
                  "transformer_width", "transformer_heads", "transformer_layers")
    })
    state = module.adopt_converted_state(
        frozen, trainable, BNState(flat["bn/mean"], flat["bn/var"]), clip_cfg
    )
    module.ncentroid = np.asarray(module.compute_ncentroid())

    def eval_fn(_name: str) -> dict:
        return module.test(state=state)

    datasets = {
        "synthetic": {
            "metric": "auc_roc",
            "reproduced": expected_auc + perturb,
            "paper": None,
        }
    }
    return run(datasets, eval_fn, baseline_md)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="checkpoints", type=Path)
    ap.add_argument("--datasets", nargs="*", default=list(DATASETS))
    ap.add_argument("--baseline-md", default=None, type=Path,
                    help="parity-table target (default: repo BASELINE.md for real "
                         "runs, a scratch file for --dry-run so the rehearsal "
                         "never edits the production doc)")
    ap.add_argument("--allow-download", action="store_true",
                    help="fetch the released bundle from Google Drive if missing")
    ap.add_argument("--strict-paper", action="store_true",
                    help="let provisional paper-table targets gate the exit code "
                         "(default: only reproduced targets do)")
    ap.add_argument("--dry-run", action="store_true",
                    help="offline rehearsal on the synthetic corpus + golden fixture")
    ap.add_argument("--dry-run-perturb", type=float, default=0.0)
    ap.add_argument("overrides", nargs="*", help="extra dotted config overrides")
    args, extra = ap.parse_known_args(argv)
    overrides = list(args.overrides) + [a for a in extra if "=" in a]

    if args.dry_run:
        with tempfile.TemporaryDirectory() as td:
            baseline = args.baseline_md or Path(td) / "BASELINE.dryrun.md"
            rc = dry_run(Path(td), baseline, args.dry_run_perturb)
            if args.baseline_md is None:
                print(f"(dry-run table went to the scratch file {baseline}; pass "
                      "--baseline-md to write elsewhere)")
            return rc

    missing = [d for d in args.datasets if find_checkpoint(args.ckpt_dir, d) is None]
    if missing and args.allow_download:
        download_bundle(args.ckpt_dir)
        missing = [d for d in args.datasets if find_checkpoint(args.ckpt_dir, d) is None]
    if missing:
        print(
            f"missing checkpoints for {missing} under {args.ckpt_dir} — download "
            "the released bundle (reference README.md:72-76) or pass "
            "--allow-download on a host with egress", file=sys.stderr,
        )
        return 2

    def eval_fn(name: str) -> dict:
        ckpt = find_checkpoint(args.ckpt_dir, name)
        from anomalyclip_tpu.models.clip.registry import sha256_file

        print(f"{name}: {ckpt} sha256={sha256_file(ckpt)}")
        return evaluate_checkpoint(name, ckpt, overrides)

    return run(
        {d: DATASETS[d] for d in args.datasets}, eval_fn,
        args.baseline_md or REPO_ROOT / "BASELINE.md", args.strict_paper,
    )


if __name__ == "__main__":
    raise SystemExit(main())
