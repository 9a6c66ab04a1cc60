#!/usr/bin/env python
"""Stage the real JetNet datasets for training/evaluation.

The reference trains on the JetNet datasets distributed via Zenodo
(train.py:37-67 through the jetnet library, which downloads from the same
records):

- JetNet (30 particles):   https://zenodo.org/records/3601443
  files: g.hdf5, q.hdf5, t.hdf5
- JetNet150 (150 particles): https://zenodo.org/records/6975118
  files: g150.hdf5, q150.hdf5, t150.hdf5, w150.hdf5, z150.hdf5

This script downloads the requested files into ``--datasets-path`` and
verifies each against the MD5 checksum published in the Zenodo record
metadata (fetched from the API, so no checksums are hardcoded here).
It requires network access — in a zero-egress environment, stage the files
out-of-band and this script (or ``--verify-only``) will still verify layout:
``h5py.File(f)["particle_features"] [num_jets, N, 4]`` and
``["jet_features"]``.

Usage:
    python scripts/stage_jetnet.py --datasets-path datasets --jets g q t
    python scripts/stage_jetnet.py --datasets-path datasets --jets g --n150
    python scripts/stage_jetnet.py --datasets-path datasets --verify-only

Once ``<datasets-path>/g.hdf5`` exists, ``tests/test_real_data.py``
activates automatically (point it there with MPGAN_TPU_DATASETS), and
training uses it via ``--datasets-path``.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import pathlib
import sys
import urllib.request

RECORDS = {False: "3601443", True: "6975118"}  # n150 -> Zenodo record id


def _record_files(record_id: str) -> dict[str, dict]:
    url = f"https://zenodo.org/api/records/{record_id}"
    with urllib.request.urlopen(url, timeout=60) as r:
        meta = json.load(r)
    out = {}
    for f in meta["files"]:
        name = f.get("key") or f.get("filename")
        checksum = f.get("checksum", "")
        link = f["links"].get("self") or f["links"].get("download")
        out[name] = {"md5": checksum.removeprefix("md5:"), "url": link}
    return out


def _md5(path: pathlib.Path) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _verify_layout(path: pathlib.Path) -> None:
    import h5py

    with h5py.File(path, "r") as f:
        p = f["particle_features"]
        j = f["jet_features"]
        assert p.ndim == 3 and p.shape[-1] == 4, f"{path}: bad particle_features {p.shape}"
        assert j.ndim == 2, f"{path}: bad jet_features {j.shape}"
    print(f"  layout OK: {path.name} particle_features {p.shape}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets-path", default="datasets")
    ap.add_argument("--jets", nargs="+", default=["g", "q", "t"],
                    choices=["g", "q", "t", "w", "z"])
    ap.add_argument("--n150", action="store_true", help="stage JetNet150 files")
    ap.add_argument("--verify-only", action="store_true",
                    help="only verify layout of already-staged files")
    args = ap.parse_args()

    dest = pathlib.Path(args.datasets_path)
    dest.mkdir(parents=True, exist_ok=True)
    suffix = "150" if args.n150 else ""
    names = [f"{j}{suffix}.hdf5" for j in args.jets]

    if args.verify_only:
        for name in names:
            p = dest / name
            if p.exists():
                _verify_layout(p)
            else:
                print(f"  missing: {p}")
        return 0

    if args.n150 is False and any(j in ("w", "z") for j in args.jets):
        print("note: w/z exist only in JetNet150 (record 6975118); use --n150")

    files = _record_files(RECORDS[args.n150])
    for name in names:
        if name not in files:
            print(f"  {name}: not in Zenodo record {RECORDS[args.n150]} "
                  f"(has: {sorted(files)})")
            continue
        p = dest / name
        if p.exists() and _md5(p) == files[name]["md5"]:
            print(f"  {name}: already staged, checksum OK")
            continue
        print(f"  downloading {name} ...")
        urllib.request.urlretrieve(files[name]["url"], p)
        got = _md5(p)
        if got != files[name]["md5"]:
            print(f"  {name}: CHECKSUM MISMATCH {got} != {files[name]['md5']}")
            return 1
        print(f"  {name}: checksum OK ({files[name]['md5']})")
        _verify_layout(p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
