"""Offline rehearsal of the released-checkpoint parity closure (VERDICT r4 #4).

The real run needs egress + the released weights (reference README.md:72-76);
the machinery — checkpoint location, the conversion+eval path, the parity
table rewrite in BASELINE.md, the 0.2-pt threshold exit code — must be proven
offline so the one command works the day the artifacts are reachable.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT / "scripts"))


@pytest.mark.slow
def test_dry_run_writes_table_and_exits_zero(tmp_path, monkeypatch):
    import verify_released_ckpts as vrc

    baseline = tmp_path / "BASELINE.md"
    baseline.write_text("# BASELINE\n\nexisting text\n")
    rc = vrc.dry_run(tmp_path / "root", baseline)
    assert rc == 0
    text = baseline.read_text()
    assert "existing text" in text  # rewrite is additive outside the markers
    assert vrc.BEGIN in text and vrc.END in text
    assert "| synthetic | auc_roc |" in text
    assert "**NO**" not in text

    # idempotent: a second run replaces the marked block, not appends
    rc = vrc.dry_run(tmp_path / "root2", baseline)
    assert rc == 0
    assert baseline.read_text().count(vrc.BEGIN) == 1


@pytest.mark.slow
def test_dry_run_perturbed_target_fails_threshold(tmp_path):
    import verify_released_ckpts as vrc

    baseline = tmp_path / "BASELINE.md"
    # 0.5 pts past the golden AUC must trip the 0.2-pt gate
    rc = vrc.dry_run(tmp_path / "root", baseline, perturb=0.005)
    assert rc == 1
    assert "**NO**" in baseline.read_text()


def test_checkpoint_location_and_missing_exit():
    import verify_released_ckpts as vrc

    assert vrc.find_checkpoint(Path("/nonexistent"), "ucfcrime") is None
    rc = vrc.main(["--ckpt-dir", "/nonexistent", "--datasets", "ucfcrime"])
    assert rc == 2  # missing artifacts is a distinct exit from parity failure


def test_clip_registry_table_matches_reference_contract():
    """The SHA-pinned _MODELS table (reference clip.py:31-81): every named arch
    resolves to a URL whose second-to-last segment is its SHA256."""
    from anomalyclip_tpu.models.clip.registry import _ARCH_CONFIGS, _MODELS

    for arch in _ARCH_CONFIGS:
        assert arch in _MODELS, arch
    for arch, url in _MODELS.items():
        sha = url.split("/")[-2]
        assert len(sha) == 64 and all(c in "0123456789abcdef" for c in sha), arch
        assert url.startswith("https://openaipublic.azureedge.net/clip/models/")


def test_download_clip_verifies_sha(tmp_path, monkeypatch):
    """download_clip must reject a hash-mismatched payload and keep a verified
    cache hit without re-downloading."""
    import hashlib
    import io
    import urllib.request

    from anomalyclip_tpu.models.clip import registry

    payload = b"not actually a checkpoint"
    good_sha = hashlib.sha256(payload).hexdigest()

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(
        urllib.request, "urlopen", lambda url, timeout=0: _Resp(payload)
    )

    # mismatched pin -> raises, partial file removed
    monkeypatch.setitem(
        registry._MODELS, "FAKE", "https://openaipublic.azureedge.net/clip/models/"
        + "0" * 64 + "/FAKE.pt",
    )
    with pytest.raises(RuntimeError, match="SHA256 mismatch"):
        registry.download_clip("FAKE", root=tmp_path)
    assert not list(tmp_path.glob("*.partial"))

    # matching pin -> lands in the reference cache layout; second call is a hit
    monkeypatch.setitem(
        registry._MODELS, "FAKE",
        f"https://openaipublic.azureedge.net/clip/models/{good_sha}/FAKE.pt",
    )
    target = registry.download_clip("FAKE", root=tmp_path)
    assert target.read_bytes() == payload
    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("re-downloaded")),
    )
    assert registry.download_clip("FAKE", root=tmp_path) == target


def test_cache_filename_matches_reference_layout():
    """Cache filenames must be the release URL's basename — the reference's
    clip.load layout (clip.py:91) — NOT the literal arch string: the @336px
    arch's file is ViT-L-14-336px.pt. The legacy literal spelling stays as a
    fallback candidate so earlier builds' caches still resolve."""
    from anomalyclip_tpu.models.clip import registry

    assert registry._checkpoint_filename("ViT-L/14@336px") == "ViT-L-14-336px.pt"
    assert registry._checkpoint_filename("ViT-B/16") == "ViT-B-16.pt"
    names = [p.name for p in registry._cache_candidates("ViT-L/14@336px")]
    assert "ViT-L-14-336px.pt" in names and "ViT-L-14@336px.pt" in names
    assert names.index("ViT-L-14-336px.pt") < names.index("ViT-L-14@336px.pt")


def test_resolve_clip_attempts_pinned_download(monkeypatch, tmp_path):
    """resolve_clip's documented step 3 — self-bootstrap from the SHA-pinned
    release table — must actually be attempted once local candidates miss,
    and the ANOMALYCLIP_NO_DOWNLOAD kill switch must suppress it."""
    from anomalyclip_tpu.models.clip import registry

    calls = []

    def fake_download(arch, root=None, timeout=60):
        calls.append(arch)
        raise OSError("no egress in this environment")

    monkeypatch.setattr(registry, "download_clip", fake_download)
    monkeypatch.delenv("CLIP_CKPT_PATH", raising=False)
    monkeypatch.delenv("ANOMALYCLIP_NO_DOWNLOAD", raising=False)
    with pytest.raises(FileNotFoundError, match="no egress"):
        registry.resolve_clip("ViT-B/16", clip_init="pretrained")
    assert calls == ["ViT-B/16"]

    monkeypatch.setenv("ANOMALYCLIP_NO_DOWNLOAD", "1")
    with pytest.raises(FileNotFoundError) as ei:
        registry.resolve_clip("ViT-B/16", clip_init="pretrained")
    assert calls == ["ViT-B/16"] and "download attempt" not in str(ei.value)


def test_paper_targets_do_not_gate_exit_code(tmp_path):
    """BASELINE.md's parity target is the reference's REPRODUCED numbers; the
    provisional paper-table values must be reported (delta + table verdict)
    but only gate the exit code under --strict-paper."""
    import verify_released_ckpts as vrc

    datasets = {"fake": {"metric": "m", "reproduced": None, "paper": 0.90}}
    eval_fn = lambda name: {"m": 0.50}  # 40-pt miss vs the paper number

    baseline = tmp_path / "B.md"
    assert vrc.run(dict(datasets), eval_fn, baseline) == 0
    text = baseline.read_text()
    assert "paper (provisional)" in text and "**NO**" in text

    assert vrc.run(dict(datasets), eval_fn, baseline, strict_paper=True) == 1

    reproduced = {"fake": {"metric": "m", "reproduced": 0.90, "paper": None}}
    assert vrc.run(reproduced, eval_fn, baseline) == 1
