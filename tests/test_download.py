"""ckpt/download.py: cache-hit, md5-recheck, and offline error paths
(no network in this image — the download itself is exercised via a
file:// URL monkeypatch)."""
import hashlib
import os

import pytest

from controlvar_tpu.ckpt.download import (
    CKPT_MAP,
    MD5_MAP,
    URL_MAP,
    get_ckpt_path,
    md5_hash,
)


def test_cache_hit_returns_without_download(tmp_path):
    p = tmp_path / CKPT_MAP["vgg_lpips"]
    p.write_bytes(b"cached")
    # no network call happens on a cache hit (check=False skips md5 too)
    assert get_ckpt_path("vgg_lpips", str(tmp_path)) == str(p)


def test_md5_recheck_flags_stale_cache(tmp_path, monkeypatch):
    p = tmp_path / CKPT_MAP["vgg_lpips"]
    p.write_bytes(b"corrupted")
    good = b"the real weights"
    src = tmp_path / "src.bin"
    src.write_bytes(good)
    monkeypatch.setitem(URL_MAP, "vgg_lpips", src.as_uri())
    monkeypatch.setitem(MD5_MAP, "vgg_lpips", hashlib.md5(good).hexdigest())
    out = get_ckpt_path("vgg_lpips", str(tmp_path), check=True)
    assert open(out, "rb").read() == good


def test_download_via_file_url_and_md5_gate(tmp_path, monkeypatch):
    good = b"released checkpoint bytes"
    src = tmp_path / "remote.pth"
    src.write_bytes(good)
    monkeypatch.setitem(URL_MAP, "controlvar_d16", src.as_uri())
    out = get_ckpt_path("controlvar_d16", str(tmp_path / "cache"))
    assert os.path.basename(out) == "d16.pth"
    assert md5_hash(out) == hashlib.md5(good).hexdigest()
    # md5 mismatch must raise, not return corrupt weights
    monkeypatch.setitem(MD5_MAP, "controlvar_d16", "0" * 32)
    os.remove(out)
    with pytest.raises(RuntimeError, match="md5 mismatch"):
        get_ckpt_path("controlvar_d16", str(tmp_path / "cache"))


def test_offline_error_is_actionable(tmp_path, monkeypatch):
    monkeypatch.setitem(URL_MAP, "vgg_lpips",
                        "http://127.0.0.1:9/unreachable")
    with pytest.raises(RuntimeError, match="no network"):
        get_ckpt_path("vgg_lpips", str(tmp_path))


def test_unknown_name():
    with pytest.raises(KeyError):
        get_ckpt_path("nope", "/tmp")
