"""Data-pipeline tests (SURVEY §4.3): programmatic MIDI round-trip, pianoroll
quantize round-trip, windowing, batcher determinism, corpus-pickle loading."""

import pickle

import numpy as np
import pytest

from multinn_tpu.data import midi, pianoroll as pr
from multinn_tpu.data.datasets import DataConfig, Dataset


def make_midi():
    m = midi.MidiFile(ticks_per_quarter=480,
                      tempo_us_per_quarter=600000)      # 100 bpm
    piano = midi.Instrument(program=0, is_drum=False, name="piano")
    piano.notes = [
        midi.Note(pitch=60, velocity=90, start=0, end=480),
        midi.Note(pitch=64, velocity=80, start=480, end=960),
        midi.Note(pitch=67, velocity=70, start=480, end=1440),
    ]
    drums = midi.Instrument(program=0, is_drum=True, name="drums")
    drums.notes = [midi.Note(pitch=36, velocity=100, start=0, end=120),
                   midi.Note(pitch=38, velocity=100, start=960, end=1080)]
    m.instruments = [piano, drums]
    return m


def test_midi_bytes_roundtrip():
    m = make_midi()
    data = midi.dumps(m)
    m2 = midi.loads(data)
    assert m2.ticks_per_quarter == 480
    assert m2.tempo_us_per_quarter == 600000
    assert abs(m2.bpm - 100.0) < 1e-6
    assert len(m2.instruments) == 2
    by_drum = {ins.is_drum: ins for ins in m2.instruments}
    got = [(n.pitch, n.start, n.end) for n in by_drum[False].notes]
    assert got == [(60, 0, 480), (64, 480, 960), (67, 480, 1440)]
    got_d = [(n.pitch, n.start, n.end) for n in by_drum[True].notes]
    assert got_d == [(36, 0, 120), (38, 960, 1080)]


def test_midi_file_roundtrip(tmp_path):
    p = str(tmp_path / "x.mid")
    midi.save(make_midi(), p)
    m2 = midi.load(p)
    assert len(m2.instruments) == 2


def test_running_status_and_velocity_zero_noteoff():
    """Hand-craft a track using running status and vel-0 note-offs."""
    # delta 0, 0x90 ch0: pitch 60 vel 90; delta 0x60: pitch 60 vel 0 (off,
    # running status); delta 0: pitch 62 vel 80; delta 0x60: 62 off
    track = bytes([0x00, 0x90, 60, 90,
                   0x60, 60, 0,
                   0x00, 62, 80,
                   0x60, 62, 0])
    data = (b"MThd" + (6).to_bytes(4, "big")
            + (0).to_bytes(2, "big") + (1).to_bytes(2, "big")
            + (96).to_bytes(2, "big")
            + b"MTrk" + (len(track) + 4).to_bytes(4, "big") + track
            + b"\x00\xff\x2f\x00")
    m = midi.loads(data)
    notes = m.instruments[0].notes
    assert [(n.pitch, n.start, n.end) for n in notes] == [
        (60, 0, 96), (62, 96, 192)]


def test_quantize_roundtrip():
    """roll -> midi -> roll must be exact on grid-aligned content."""
    spec = pr.RollSpec(steps_per_quarter=4, pitch_min=21, pitch_max=108,
                       n_tracks=1)
    rng = np.random.default_rng(0)
    roll = (rng.random((64, 1, spec.n_pitches)) < 0.05).astype(np.uint8)
    m = pr.roll_to_midi(roll, spec)
    roll2 = pr.midi_to_roll(m, spec)
    # lengths may differ by trailing empty steps; compare active region
    t = min(len(roll), len(roll2))
    np.testing.assert_array_equal(roll[:t], roll2[:t])
    assert roll[t:].sum() == 0 and roll2[t:].sum() == 0


def test_quantize_roundtrip_5track():
    spec = pr.RollSpec(steps_per_quarter=4, pitch_min=24, pitch_max=107,
                       n_tracks=5)
    rng = np.random.default_rng(1)
    roll = (rng.random((32, 5, spec.n_pitches)) < 0.04).astype(np.uint8)
    m = pr.roll_to_midi(roll, spec)
    assert any(ins.is_drum for ins in m.instruments) == bool(
        roll[:, 0].sum() > 0)
    roll2 = pr.midi_to_roll(m, spec)
    t = min(len(roll), len(roll2))
    np.testing.assert_array_equal(roll[:t], roll2[:t])


def test_lpd5_track_mapping():
    assert pr.lpd5_track_index(0, True) == 0
    assert pr.lpd5_track_index(0, False) == 1     # piano
    assert pr.lpd5_track_index(25, False) == 2    # guitar
    assert pr.lpd5_track_index(33, False) == 3    # bass
    assert pr.lpd5_track_index(73, False) == 4    # flute -> strings bucket


def test_chop_windows():
    roll = np.arange(10 * 2 * 3).reshape(10, 2, 3).astype(np.uint8)
    w = pr.chop_windows(roll, window=4, pad=False)
    assert w.shape == (2, 4, 2, 3)
    w2 = pr.chop_windows(roll, window=4, pad=True)
    assert w2.shape == (3, 4, 2, 3)
    assert w2[2, 2:].sum() == 0                   # zero-padded tail
    short = pr.chop_windows(roll[:2], window=4, pad=True)
    assert short.shape == (1, 4, 2, 3)


def test_synthetic_dataset_and_batcher():
    cfg = DataConfig.from_preset("synthetic", synthetic_songs=12,
                                 synthetic_steps=128, window=32,
                                 batch_size=4)
    ds = Dataset(cfg)
    assert ds.windows["train"].shape[1:] == (32, 5, 84)
    b = next(iter(ds.batches("train", epoch=0)))
    assert b.shape == (4, 32, 5, 84) and b.dtype == np.uint8
    # determinism per (seed, epoch)
    b2 = next(iter(ds.batches("train", epoch=0)))
    np.testing.assert_array_equal(b, b2)
    b3 = next(iter(ds.batches("train", epoch=1)))
    assert not np.array_equal(b, b3)
    seeds = ds.seed_windows("valid", n=2)
    assert seeds.shape == (2, 32, 5, 84)


def test_pickle_corpus_loader(tmp_path):
    """The Boulanger-style {split: [list of tuples-of-pitches]} pickle."""
    corpus = {
        "train": [[(60, 64), (62,), ()], [(70,), (71, 72)]],
        "valid": [[(60,), (61,)]],
        "test": [[(65,)]],
    }
    p = str(tmp_path / "jsb.pkl")
    with open(p, "wb") as f:
        pickle.dump(corpus, f)
    cfg = DataConfig.from_preset("jsb", source="pickle", path=p,
                                 window=4, batch_size=1)
    ds = Dataset(cfg)
    assert ds.windows["train"].shape == (2, 4, 1, 88)
    # first song step 0: pitches 60,64 -> indices 39,43
    assert ds.windows["train"][0, 0, 0, 39] == 1
    assert ds.windows["train"][0, 0, 0, 43] == 1
    assert ds.windows["train"][0, 0, 0].sum() == 2
    assert ds.windows["valid"].shape[0] == 1


def test_npz_loader(tmp_path):
    spec_pitches = 88
    rolls = np.empty(2, dtype=object)
    rolls[0] = (np.random.default_rng(0).random((20, 1, spec_pitches))
                < 0.1).astype(np.uint8)
    rolls[1] = (np.random.default_rng(1).random((30, spec_pitches))
                < 0.1).astype(np.uint8)       # 2-D variant
    p = str(tmp_path / "rolls.npz")
    np.savez(p, rolls=rolls)
    cfg = DataConfig.from_preset("jsb", source="npz", path=p, window=8,
                                 batch_size=2, splits=(0.5, 0.25, 0.25))
    ds = Dataset(cfg)
    assert ds.windows["train"].shape[1:] == (8, 1, 88)


def test_chop_windows_masked():
    roll = np.ones((10, 1, 4), np.uint8)
    w, m = pr.chop_windows_masked(roll, window=4)
    assert w.shape == (3, 4, 1, 4) and m.shape == (3, 4)
    np.testing.assert_array_equal(m[0], [1, 1, 1, 1])
    np.testing.assert_array_equal(m[2], [1, 1, 0, 0])   # 2 real frames
    # short roll: single padded window
    w2, m2 = pr.chop_windows_masked(roll[:3], window=8)
    assert w2.shape == (1, 8, 1, 4)
    np.testing.assert_array_equal(m2[0], [1, 1, 1, 0, 0, 0, 0, 0])


def test_dataset_masks_align_with_windows():
    cfg = DataConfig.from_preset("synthetic", synthetic_songs=4,
                                 synthetic_steps=100, window=64,
                                 batch_size=2)
    ds = Dataset(cfg)
    for split in ("train", "valid", "test"):
        assert ds.masks[split].shape == ds.windows[split].shape[:2]
        # padded frames must be all-zero in the windows
        w, m = ds.windows[split], ds.masks[split]
        assert w[m == 0].sum() == 0
    # batches with masks
    b, mk = next(iter(ds.batches("train", with_masks=True)))
    assert b.shape[:2] == mk.shape


def test_preset_source_defaults():
    """Non-synthetic presets must NOT silently fall back to synthetic data."""
    assert DataConfig.from_preset("jsb").source == "pickle"
    assert DataConfig.from_preset("lpd5").source == "midi_dir"
    assert DataConfig.from_preset("synthetic").source == "synthetic"
    with pytest.raises(ValueError):
        Dataset(DataConfig.from_preset("lpd5"))   # no path -> loud failure


def test_midi_writer_many_programs_roundtrip():
    """>15 distinct melodic programs (Lakh-scale re-emission): the writer
    must keep every instrument's program correct — dedicated channels for
    the first programs, interleaved program changes on a shared overflow
    channel for the rest — and the reader must split them back apart."""
    m = midi.MidiFile(ticks_per_quarter=480)
    n_ins = 20
    for i in range(n_ins):
        ins = midi.Instrument(program=i * 5, is_drum=False)
        # stagger notes so overflow instruments interleave in time
        ins.notes.append(midi.Note(pitch=40 + i, velocity=90,
                                   start=i * 60, end=i * 60 + 240))
        ins.notes.append(midi.Note(pitch=41 + i, velocity=90,
                                   start=2400 + i * 60, end=2400 + i * 60 + 240))
        m.instruments.append(ins)
    m2 = midi.loads(midi.dumps(m))
    got = {}
    for ins in m2.instruments:
        got.setdefault(ins.program, []).extend(
            (n.pitch, n.start, n.end) for n in ins.notes)
    assert set(got) == {i * 5 for i in range(n_ins)}
    for i in range(n_ins):
        expect = [(40 + i, i * 60, i * 60 + 240),
                  (41 + i, 2400 + i * 60, 2400 + i * 60 + 240)]
        assert sorted(got[i * 5]) == expect, (i, got[i * 5])


def test_midi_reader_attributes_program_at_note_on():
    """A program change while a note sounds must not re-attribute it."""
    track = bytearray()
    track += b"\x00" + bytes([0xC0, 10])           # program 10
    track += b"\x00" + bytes([0x90, 60, 90])       # note on
    track += b"\x30" + bytes([0xC0, 20])           # program change mid-note
    track += b"\x30" + bytes([0x80, 60, 0])        # note off
    data = (b"MThd" + (6).to_bytes(4, "big")
            + (0).to_bytes(2, "big") + (1).to_bytes(2, "big")
            + (96).to_bytes(2, "big")
            + b"MTrk" + len(bytes(track) + b"\x00\xff\x2f\x00").to_bytes(4, "big")
            + bytes(track) + b"\x00\xff\x2f\x00")
    m = midi.loads(data)
    assert len(m.instruments) == 1
    assert m.instruments[0].program == 10
