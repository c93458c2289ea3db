"""Loader for the C-reference oracle vectors (tests/fixtures/oracle_vectors.npz).

The archive is produced by tools/gen_oracle_vectors.c + tools/pack_vectors.py
from the read-only reference checkout; see those files for the record layouts.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

import numpy as np

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@lru_cache(maxsize=1)
def load():
    data = np.load(os.path.join(FIXTURES, "oracle_vectors.npz"))
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    return data, manifest


def kernel_table() -> np.ndarray:
    data, _ = load()
    return data["kernel_table"]


def configs() -> np.ndarray:
    """Rows: in, out, lpf, ok, stretched, int_radius, delta, step,
    ratio(in,out), ratio(out,in)."""
    data, _ = load()
    return data["configs"]


def lowest_cases():
    """Yield dicts for each single-frame lowest-level case."""
    data, _ = load()
    meta = data["lowest__meta"]
    inputs = data["lowest__input"]
    outputs = data["lowest__output"]
    in_off = 0
    out_off = 0
    for row in meta:
        in_rate, out_rate, lpf, ch, total, pos, frac = (int(v) for v in row)
        n_in = total * ch
        yield {
            "rates": (in_rate, out_rate, lpf),
            "channels": ch,
            "input": inputs[in_off : in_off + n_in].reshape(total, ch),
            "position": (pos, frac),
            "expected": outputs[out_off : out_off + ch],
        }
        in_off += n_in
        out_off += ch


def scripts(kind: str):
    """Yield (name, meta, ops, out, stream) for lowlevel/highlevel scripts."""
    data, manifest = load()
    for name, meta in manifest.items():
        if isinstance(meta, dict) and meta.get("kind") == kind:
            yield (
                name,
                meta,
                data[f"{name}__ops"],
                data[f"{name}__out"],
                data[f"{name}__stream"],
            )


def golden(name: str) -> np.ndarray:
    """Raw s32le golden dump regenerated from the reference (BASELINE.md)."""
    return np.fromfile(os.path.join(FIXTURES, name), dtype="<i4")


def pcm_fixture() -> np.ndarray:
    """tests/test.flac decoded to interleaved s16 stereo (md5 in BASELINE.md)."""
    raw = np.fromfile(os.path.join(FIXTURES, "test_pcm_s16le.raw"), dtype="<i2")
    return raw.reshape(-1, 2)
