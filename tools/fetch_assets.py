"""External-asset store: locate / verify / (optionally) download the
pretrained weight blobs the framework consumes.

The reference ships an auto-download helper only for the DeepSpeech frozen
graph (data_util/deepspeech_features/deepspeech_store.py:16-66: cache dir
+ SHA1 verification + zip download-and-extract + re-verify); every other
blob is a manual checkout artifact. This tool generalizes that contract to
the whole asset set:

    python tools/fetch_assets.py --list
    python tools/fetch_assets.py --verify [--store DIR]
    python tools/fetch_assets.py --fetch deepspeech [--store DIR]

Offline environments (the default assumption): --verify checks whatever
is present against the registered SHA1s and reports the rest as missing
with their upstream source, exactly what the reference's
.MISSING_LARGE_BLOBS workflow needs. --fetch performs the reference's
download-and-extract flow for assets with a registered URL.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import logging
import os
import sys
import zipfile
from dataclasses import dataclass
from typing import Optional

DEFAULT_STORE = os.environ.get(
    "DFANERF_ASSET_STORE", os.path.join("~", ".dfanerf_tpu", "assets")
)


@dataclass(frozen=True)
class Asset:
    name: str
    file_name: str
    sha1: Optional[str]  # None = no registered hash (verify presence only)
    url: Optional[str]   # None = manual asset (no auto-download source)
    what: str


# SHA1s/URLs come from the reference where it records them; assets the
# reference itself lists in .MISSING_LARGE_BLOBS have no registered hash
# and are verified by presence.
ASSETS = [
    Asset("deepspeech", "deepspeech-0_1_0-b90017e8.pb",
          "b90017e816572ddce84f5843f1fa21e6a377975e",
          "https://github.com/osmr/deepspeech_features/releases/download/"
          "v0.0.1/deepspeech-0_1_0-b90017e8.pb.zip",
          "DeepSpeech 0.1.0 frozen graph (deepspeech_store.py:31-33)"),
    Asset("raft_small", "raft-small.pth", None, None,
          "RAFT-small correspondence weights (UNFaceFlow)"),
    Asset("blazeface", "blazeface.pth", None, None,
          "BlazeFace detector weights (shipped in the reference)"),
    Asset("blazeface_anchors", "anchors.npy", None, None,
          "BlazeFace anchor table (shipped in the reference)"),
    Asset("hrnet_face", "HR18-300W.pth", None, None,
          "HRNet-W18 68-keypoint landmark model"),
    Asset("eye_ghostnet", "eye_lms_6kpts.pth", None, None,
          "GhostNet encoder-decoder 6-keypoint eye model"),
    Asset("bisenet", "79999_iter.pth", None, None,
          "BiSeNet face-parsing weights (.MISSING_LARGE_BLOBS)"),
    Asset("wav2exp", "audio_encoder.pth", None, None,
          "Wav2Lip-style audio encoder (.MISSING_LARGE_BLOBS)"),
    Asset("unfaceflow", "sgd_NNRT_model_epoch19008_50000.pth", None, None,
          "NeuralNRT flow model (.MISSING_LARGE_BLOBS)"),
    Asset("disentangler", "dis_ckpt.pth", None, None,
          "Expression disentangler checkpoint (64_32)"),
]


def sha1_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha1()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def asset_path(asset: Asset, store: str) -> str:
    return os.path.join(os.path.expanduser(store), asset.file_name)


def verify(store: str) -> dict:
    """Status per asset: ok / sha1_mismatch / missing(+source)."""
    out = {}
    for a in ASSETS:
        p = asset_path(a, store)
        if not os.path.exists(p):
            out[a.name] = {"status": "missing", "path": p,
                           "source": a.url or "manual", "what": a.what}
        elif a.sha1 is None:
            out[a.name] = {"status": "present_unhashed", "path": p}
        elif sha1_of(p) == a.sha1:
            out[a.name] = {"status": "ok", "path": p}
        else:
            out[a.name] = {"status": "sha1_mismatch", "path": p,
                           "expected": a.sha1}
    return out


def fetch(name: str, store: str) -> str:
    """The reference's download-and-extract flow (deepspeech_store.py:
    40-66): download <file>.zip next to the target, extract, remove the
    zip, re-verify the SHA1."""
    asset = next((a for a in ASSETS if a.name == name), None)
    if asset is None:
        raise SystemExit(f"unknown asset {name!r}; --list shows the registry")
    p = asset_path(asset, store)
    if os.path.exists(p) and asset.sha1 and sha1_of(p) == asset.sha1:
        return p
    if asset.url is None:
        raise SystemExit(
            f"{name} has no registered download source — place "
            f"{asset.file_name} in {os.path.dirname(p)} manually ({asset.what})"
        )
    os.makedirs(os.path.dirname(p), exist_ok=True)
    zip_path = p + ".zip"
    logging.info("downloading %s -> %s", asset.url, zip_path)
    import urllib.request

    urllib.request.urlretrieve(asset.url, zip_path)
    if zip_path.endswith(".zip"):
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(os.path.dirname(p))
        os.remove(zip_path)
    if asset.sha1 and sha1_of(p) != asset.sha1:
        raise SystemExit(f"SHA1 mismatch after download for {name}")
    return p


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", default=DEFAULT_STORE)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--fetch", metavar="NAME")
    args = ap.parse_args(argv)
    if args.list:
        for a in ASSETS:
            src = a.url or "manual"
            print(f"{a.name:20s} {a.file_name:42s} {src}")
        return
    if args.verify:
        print(json.dumps(verify(args.store), indent=2))
        return
    if args.fetch:
        print(fetch(args.fetch, args.store))
        return
    ap.print_help()


if __name__ == "__main__":
    main()
