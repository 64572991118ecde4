"""Data pipeline (SURVEY L1, C1–C4): first-party MIDI I/O (no external MIDI
deps on this image), pianoroll quantize/binarize/track-split, dataset loaders
and the batcher."""

from multinn_tpu.data import midi, pianoroll, datasets  # noqa: F401
