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
