"""Asset store tool (tools/fetch_assets.py) — the reference's
deepspeech_store.py cache/verify contract generalized to all weights."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import fetch_assets as fa


def test_verify_reports_missing_and_ok(tmp_path):
    store = str(tmp_path)
    # fabricate one asset with a registered hash
    ds = next(a for a in fa.ASSETS if a.name == "deepspeech")
    p = os.path.join(store, ds.file_name)
    with open(p, "wb") as f:
        f.write(b"not the real graph")
    out = fa.verify(store)
    assert out["deepspeech"]["status"] == "sha1_mismatch"
    assert out["raft_small"]["status"] == "missing"
    assert out["raft_small"]["source"] == "manual"
    # presence-only asset
    with open(os.path.join(store, "raft-small.pth"), "wb") as f:
        f.write(b"x")
    assert fa.verify(store)["raft_small"]["status"] == "present_unhashed"


def test_sha1_roundtrip(tmp_path):
    p = tmp_path / "blob"
    p.write_bytes(b"hello world")
    import hashlib
    assert fa.sha1_of(str(p)) == hashlib.sha1(b"hello world").hexdigest()


def test_fetch_manual_asset_errors(tmp_path):
    import pytest
    with pytest.raises(SystemExit, match="manual"):
        fa.fetch("bisenet", str(tmp_path))
