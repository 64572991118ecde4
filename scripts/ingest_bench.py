#!/usr/bin/env python
"""Corpus-scale MIDI ingest benchmark (SURVEY C1 / [B:11] Lakh readiness;
VERDICT r3 #3).

Synthesizes N distinct .mid files once (first-party writer), then measures
end-to-end file->pianoroll throughput for the native C++ fast path
(native/midi_fast.cpp via ctypes) and the pure-Python reference layer.
Lakh is ~10^5 files; at the measured native rate the full corpus cost is
reported so BASELINE.md can carry a concrete ingest budget.

    python scripts/ingest_bench.py [--files 10000] [--python-files 300]

Prints one JSON line. CPU-only (no TPU involvement).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    ap.add_argument("--files", type=int, default=10000)
    ap.add_argument("--python-files", type=int, default=300,
                    help="subset for the (slow) pure-Python rate")
    ap.add_argument("--steps", type=int, default=256,
                    help="grid steps per synthetic song (~4x a JSB chorale)")
    ap.add_argument("--keep-dir", default=None,
                    help="write files here and keep them (default: tmp)")
    args = ap.parse_args(argv)

    from multinn_tpu.data import midi, native, pianoroll as pr
    from multinn_tpu.data.datasets import DataConfig, synthetic_corpus

    if not native.available():
        print(json.dumps({"error": "native library unavailable"}))
        return 1

    out_dir = args.keep_dir or tempfile.mkdtemp(prefix="ingest_bench_")
    os.makedirs(out_dir, exist_ok=True)
    cfg = DataConfig.from_preset("lpd5", synthetic_songs=64,
                                 synthetic_steps=args.steps)
    spec = cfg.spec()
    # 64 distinct songs, cycled with distinct filenames — parse cost is
    # per-file, so content variety matters less than file count; still,
    # synthesize all 64 variants to defeat any warm-path shortcuts
    rolls = synthetic_corpus(cfg)
    blobs = [midi.dumps(pr.roll_to_midi(r, spec)) for r in rolls]
    t0 = time.perf_counter()
    paths = []
    for i in range(args.files):
        p = os.path.join(out_dir, f"s{i:06d}.mid")
        with open(p, "wb") as f:
            f.write(blobs[i % len(blobs)])
        paths.append(p)
    write_s = time.perf_counter() - t0
    total_bytes = sum(len(blobs[i % len(blobs)]) for i in range(args.files))

    # --- native path: parse + quantize each file ------------------------
    t0 = time.perf_counter()
    n_notes = 0
    for p in paths:
        roll = native.midi_file_to_roll(p, spec)
        n_notes += int(roll.sum())
    native_s = time.perf_counter() - t0
    native_fps = len(paths) / native_s

    # --- python reference path on a subset ------------------------------
    sub = paths[:min(args.python_files, len(paths))]
    t0 = time.perf_counter()
    for p in sub:
        pr.midi_to_roll(midi.load(p), spec)
    py_s = time.perf_counter() - t0
    py_fps = len(sub) / py_s if sub else 0.0

    if args.keep_dir is None:
        shutil.rmtree(out_dir, ignore_errors=True)

    result = {
        "files": len(paths),
        "grid_steps_per_file": args.steps,
        "native_files_per_sec": round(native_fps, 1),
        "python_files_per_sec": round(py_fps, 1),
        "native_speedup": round(native_fps / py_fps, 1) if py_fps else None,
        "native_total_s": round(native_s, 2),
        "mb_per_sec_native": round(total_bytes / native_s / 1e6, 1),
        "lakh_100k_files_est_min": round(1e5 / native_fps / 60, 1),
        "write_files_per_sec": round(len(paths) / write_s, 1),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
