#!/usr/bin/env python3
"""Pack the binary dumps from tools/gen_oracle_vectors.c into one compressed npz.

Usage: python tools/pack_vectors.py <vectors_dir> <out.npz>

The npz holds, per manifest entry, numpy arrays named '<entry>__<field>' plus a
'__manifest__' JSON blob. tests/oracle.py knows how to unpack it.
"""
import json
import sys

import numpy as np


def main(vec_dir: str, out_path: str) -> None:
    with open(f"{vec_dir}/manifest.json") as f:
        manifest = json.load(f)
    manifest.pop("_end", None)

    arrays = {"__manifest__": np.frombuffer(json.dumps(manifest).encode(), dtype=np.uint8)}

    for name, meta in manifest.items():
        if name == "kernel_table":
            arrays["kernel_table"] = np.fromfile(f"{vec_dir}/{meta['file']}", dtype="<i4")
            assert arrays["kernel_table"].size == meta["count"]
        elif name == "configs":
            a = np.fromfile(f"{vec_dir}/{meta['file']}", dtype="<i8")
            arrays["configs"] = a.reshape(meta["rows"], meta["cols"])
        elif name == "lowest":
            arrays["lowest__meta"] = np.fromfile(
                f"{vec_dir}/{meta['meta']}", dtype="<i8"
            ).reshape(meta["cases"], meta["meta_cols"])
            arrays["lowest__input"] = np.fromfile(f"{vec_dir}/{meta['input']}", dtype="<i2")
            arrays["lowest__output"] = np.fromfile(f"{vec_dir}/{meta['output']}", dtype="<i8")
        elif meta.get("kind") in ("lowlevel", "highlevel"):
            ops = np.fromfile(f"{vec_dir}/{name}_ops.bin", dtype="<i8")
            arrays[f"{name}__ops"] = ops.reshape(meta["ops"], meta["op_cols"])
            arrays[f"{name}__out"] = np.fromfile(f"{vec_dir}/{name}_out.bin", dtype="<i8")
            arrays[f"{name}__stream"] = np.fromfile(f"{vec_dir}/{name}_stream.bin", dtype="<i2")
        else:
            raise ValueError(f"unknown manifest entry {name}")

    np.savez_compressed(out_path, **arrays)
    print(f"packed {len(arrays)} arrays -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
