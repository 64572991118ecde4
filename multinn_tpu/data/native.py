"""ctypes bindings for the native corpus-ingest fast path (native/
midi_fast.cpp): SMF parsing + pianoroll quantization in C++, bit-exact with
the pure-Python layer (tests/test_native.py), used automatically by
``load_midi_dir`` when the shared library is present.

Build:  make -C native       (or ``python -m multinn_tpu.data.native build``)
No pybind11 on this image — plain C ABI via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmultinn_native.so")

NOTE_DTYPE = np.dtype([
    ("start_tick", np.int32), ("end_tick", np.int32),
    ("pitch", np.uint8), ("velocity", np.uint8),
    ("program", np.uint8), ("is_drum", np.uint8),
])


class _ParseResult(ctypes.Structure):
    _fields_ = [("notes", ctypes.c_void_p),
                ("n_notes", ctypes.c_int64),
                ("ticks_per_quarter", ctypes.c_int32),
                ("tempo_us_per_quarter", ctypes.c_int32)]


_lib: Optional[ctypes.CDLL] = None


def build(quiet: bool = True) -> bool:
    """Compile the shared library in-tree. Returns success."""
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=quiet)
        return os.path.exists(_SO_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) and not build():
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.midi_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                               ctypes.POINTER(_ParseResult)]
    lib.midi_parse.restype = ctypes.c_int
    lib.midi_free_result.argtypes = [ctypes.POINTER(_ParseResult)]
    lib.notes_to_roll.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_double, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p]
    lib.notes_to_roll.restype = ctypes.c_int
    lib.roll_end_tick.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.roll_end_tick.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_bytes(data: bytes):
    """Parse SMF bytes -> (notes structured array, tpqn, tempo_us).
    Raises ValueError on malformed input (parity with midi.MidiParseError)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native MIDI library unavailable "
                           "(build with `make -C native`)")
    res = _ParseResult()
    rc = lib.midi_parse(data, len(data), ctypes.byref(res))
    if rc != 0:
        raise ValueError(f"native MIDI parse failed (code {rc})")
    try:
        n = res.n_notes
        notes = np.zeros(n, NOTE_DTYPE)
        if n:
            ctypes.memmove(notes.ctypes.data, res.notes, n * NOTE_DTYPE.itemsize)
        return notes, res.ticks_per_quarter, res.tempo_us_per_quarter
    finally:
        lib.midi_free_result(ctypes.byref(res))


def midi_file_to_roll(path: str, spec) -> np.ndarray:
    """Native counterpart of pianoroll.midi_to_roll(midi.load(path), spec)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native MIDI library unavailable "
                           "(build with `make -C native`)")
    with open(path, "rb") as f:
        data = f.read()
    notes, tpqn, _ = parse_bytes(data)
    ticks_per_step = tpqn / spec.steps_per_quarter
    end_tick = int(lib.roll_end_tick(notes.ctypes.data, len(notes))) \
        if len(notes) else 0
    # match pianoroll.midi_to_roll: n_steps from python round()
    n_steps = max(1, _py_round(end_tick / ticks_per_step))
    roll = np.zeros((n_steps, spec.n_tracks, spec.n_pitches), np.uint8)
    if len(notes):
        lib.notes_to_roll(notes.ctypes.data, len(notes),
                          ctypes.c_double(ticks_per_step), n_steps,
                          spec.n_tracks, spec.pitch_min, spec.pitch_max,
                          roll.ctypes.data)
    return roll


def _py_round(x: float) -> int:
    """Python 3 round (banker's) — keep host-side rounding identical to the
    pure-Python layer."""
    return int(round(x))
