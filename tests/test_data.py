"""Data-pipeline tests (SURVEY §4.3): programmatic MIDI round-trip, pianoroll
quantize round-trip, windowing, batcher determinism, corpus-pickle loading."""

import dataclasses
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


def test_midi_to_roll_max_steps_cap():
    """max_steps bounds the quantized grid (the serving payload path's
    defense against delta-time bombs): the leading steps are preserved
    exactly and notes entirely beyond the cap are DROPPED, not clamped
    onto the final step."""
    spec = pr.RollSpec(steps_per_quarter=4, pitch_min=21, pitch_max=108,
                       n_tracks=1)
    roll = np.zeros((64, 1, spec.n_pitches), np.uint8)
    roll[:8, 0, 10] = 1          # inside the cap
    roll[40:44, 0, 20] = 1       # entirely beyond it
    m = pr.roll_to_midi(roll, spec)
    capped = pr.midi_to_roll(m, spec, max_steps=16)
    assert capped.shape[0] <= 16
    np.testing.assert_array_equal(capped[:8, 0, 10], np.ones(8, np.uint8))
    assert capped[:, 0, 20].sum() == 0     # dropped, no spurious last-step
    # uncapped behavior unchanged
    full = pr.midi_to_roll(m, spec)
    assert full[:, 0, 20].sum() == 4


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


def _smf(ntrks, division, *track_bodies, fmt=1):
    chunks = b"".join(
        b"MTrk" + len(body + b"\x00\xff\x2f\x00").to_bytes(4, "big")
        + body + b"\x00\xff\x2f\x00" for body in track_bodies)
    return (b"MThd" + (6).to_bytes(4, "big")
            + fmt.to_bytes(2, "big") + ntrks.to_bytes(2, "big")
            + division.to_bytes(2, "big") + chunks)


def test_tempo_map_and_tick_to_seconds():
    """Seconds-domain breadth (VERDICT r3 missing #3): the full tempo map is
    retained and tick_to_seconds walks it piecewise (quantization stays
    symbolic and never consults it)."""
    # 96 tpqn; tempo 120bpm at t=0, 60bpm (1e6 us/q) at tick 96
    body = (b"\x00\xff\x51\x03" + (500000).to_bytes(3, "big")
            + b"\x60\xff\x51\x03" + (1000000).to_bytes(3, "big")
            # note on at tick 96+96=192, off at 288
            + b"\x60\x90\x3c\x40" + b"\x60\x80\x3c\x00")
    m = midi.loads(_smf(1, 96, body))
    assert m.tempo_map == [(0, 500000), (96, 1000000)]
    assert m.tempo_us_per_quarter == 500000          # headline = first
    # 96 ticks at 120bpm = 0.5 s; next 96 at 60bpm = 1.0 s
    assert abs(m.tick_to_seconds(96) - 0.5) < 1e-9
    assert abs(m.tick_to_seconds(192) - 1.5) < 1e-9
    assert abs(m.duration_seconds() - (1.5 + 1.0)) < 1e-9
    # no tempo meta at all -> 120 bpm default throughout
    m2 = midi.loads(_smf(1, 96, b"\x00\x90\x3c\x40\x60\x80\x3c\x00"))
    assert m2.tempo_map == []
    assert abs(m2.duration_seconds() - 0.5) < 1e-9


def test_headline_tempo_is_earliest_tick_across_tracks():
    """bpm must agree with tempo_map[0] / tick_to_seconds at tick 0 even
    when a LATER track carries the tick-0 tempo (format 1: track order is
    not tick order). Python and native parsers agree on the rule."""
    t0 = b"\x83\x60\xff\x51\x03" + (1000000).to_bytes(3, "big")  # tick 480
    t1 = (b"\x00\xff\x51\x03" + (500000).to_bytes(3, "big")      # tick 0
          + b"\x00\x90\x3c\x40\x60\x80\x3c\x00")
    m = midi.loads(_smf(2, 96, t0, t1))
    assert m.tempo_map == [(0, 500000), (480, 1000000)]
    assert m.tempo_us_per_quarter == 500000
    from multinn_tpu.data import native
    if native.available():
        _, _, tempo = native.parse_bytes(_smf(2, 96, t0, t1))
        assert tempo == 500000


def test_format2_patterns_overlay_at_zero():
    """Documented format-2 decision (module docstring): each MTrk is an
    independent pattern, overlaid at tick 0."""
    a = b"\x00\x90\x30\x40\x60\x80\x30\x00"          # note at [0, 96)
    b = b"\x00\x91\x45\x40\x60\x81\x45\x00"          # other channel
    m = midi.loads(_smf(2, 96, a, b, fmt=2))
    starts = sorted(n.start for ins in m.instruments for n in ins.notes)
    assert starts == [0, 0]                           # both patterns at 0


def test_smpte_division_rejected():
    with pytest.raises(midi.MidiParseError, match="SMPTE"):
        midi.loads(_smf(1, 0x8000 | (25 << 8) | 40,
                        b"\x00\x90\x3c\x40\x60\x80\x3c\x00"))


def test_python_fuzz_raises_only_midiparseerror():
    """The Python layer's corruption contract: MidiParseError or success,
    never IndexError/struct.error/hang (native parity is fuzz-checked in
    test_native.py)."""
    from multinn_tpu.data.datasets import synthetic_corpus
    cfg = DataConfig(dataset="synthetic", n_tracks=5, synthetic_songs=1,
                     synthetic_steps=48)
    base = midi.dumps(pr.roll_to_midi(synthetic_corpus(cfg)[0], cfg.spec()))
    rng = np.random.RandomState(77)
    for trial in range(200):
        blob = bytearray(base)
        if trial % 2:
            blob = blob[:int(rng.randint(0, len(blob)))]
        else:
            for _ in range(int(rng.randint(1, 6))):
                blob[int(rng.randint(0, len(blob)))] = int(
                    rng.randint(0, 256))
        try:
            midi.loads(bytes(blob))
        except midi.MidiParseError:
            pass


# ---------------------------------------------------------------------------
# onset/hold encoding (data.encoding="onset_hold") + generation post-processing
# ---------------------------------------------------------------------------

def test_onset_hold_roundtrip():
    """decode(encode(r)) == r exactly, on random and structured rolls."""
    rng = np.random.default_rng(3)
    rand = (rng.random((40, 3, 12)) < 0.3).astype(np.uint8)
    np.testing.assert_array_equal(
        pr.decode_onset_hold(pr.encode_onset_hold(rand)), rand)

    from multinn_tpu.data.datasets import synthetic_corpus
    cfg = DataConfig(dataset="synthetic", n_tracks=5, synthetic_songs=1,
                     synthetic_steps=96)
    song = synthetic_corpus(cfg)[0]
    oh = pr.encode_onset_hold(song)
    assert oh.shape == song.shape[:-1] + (2 * song.shape[-1],)
    np.testing.assert_array_equal(pr.decode_onset_hold(oh), song)
    # onset and hold planes are disjoint and union to the frame roll
    d = song.shape[-1]
    assert not np.any(oh[..., :d] & oh[..., d:])
    np.testing.assert_array_equal(oh[..., :d] | oh[..., d:], song)


def test_onset_hold_decode_batched_matches_single():
    rng = np.random.default_rng(4)
    batch = (rng.random((3, 20, 2, 8)) < 0.4).astype(np.uint8)
    enc = np.stack([pr.encode_onset_hold(b) for b in batch])
    dec = pr.decode_onset_hold(enc)               # batched (N, T, K, 2D)
    for i in range(3):
        np.testing.assert_array_equal(dec[i], batch[i])


def test_onset_hold_decode_cleaning_semantics():
    """Orphan holds (no live note behind them) decode to silence; a missing
    hold ends the note; onsets always start one — the fragmentation-proofing
    the encoding exists for."""
    t_steps, d = 8, 4
    oh = np.zeros((t_steps, 1, 2 * d), np.uint8)
    # pitch 0: onset at t=1, holds t=2..4 -> note [1, 5)
    oh[1, 0, 0] = 1
    oh[2:5, 0, d + 0] = 1
    # pitch 1: orphan holds at t=3..5 (no onset) -> silence
    oh[3:6, 0, d + 1] = 1
    # pitch 2: onset t=0, hold t=1, GAP at t=2, hold t=3 -> note [0, 2) only
    oh[0, 0, 2] = 1
    oh[1, 0, d + 2] = 1
    oh[3, 0, d + 2] = 1
    frames = pr.decode_onset_hold(oh)
    expect = np.zeros((t_steps, 1, d), np.uint8)
    expect[1:5, 0, 0] = 1
    expect[0:2, 0, 2] = 1
    np.testing.assert_array_equal(frames, expect)


def test_decode_rolls_dispatch():
    r = np.ones((4, 1, 6), np.uint8)
    np.testing.assert_array_equal(pr.decode_rolls(r, "frame"), r)
    with pytest.raises(ValueError, match="unknown encoding"):
        pr.decode_rolls(r, "nope")
    with pytest.raises(ValueError, match="odd"):
        pr.decode_onset_hold(np.zeros((4, 1, 5), np.uint8))


def test_dataset_onset_hold():
    cfg = DataConfig.from_preset("synthetic", synthetic_songs=8,
                                 synthetic_steps=96, window=32,
                                 batch_size=4, encoding="onset_hold")
    assert cfg.frame_dim == 168
    ds = Dataset(cfg)
    assert ds.windows["train"].shape[1:] == (32, 5, 168)
    assert ds.frame_dim == 168
    dec = ds.decode(ds.windows["train"])
    assert dec.shape[1:] == (32, 5, 84)
    assert set(np.unique(dec)) <= {0, 1}
    # the decoded windows match the frame-encoded dataset's windows except
    # for notes truncated at window starts (cross-window holds are dropped
    # by the stateless-BPTT windowing) — so decoded <= frame windows, and
    # interior frames agree
    frame_ds = Dataset(DataConfig.from_preset(
        "synthetic", synthetic_songs=8, synthetic_steps=96, window=32,
        batch_size=4))
    ref = frame_ds.windows["train"]
    assert np.all(dec <= ref)
    # every dropped frame belongs to a note sounding continuously from the
    # window's first frame (its onset lives in the previous window)
    dropped = ref & ~dec & 1
    sounding_from_start = np.cumprod(ref, axis=1)
    assert np.all(dropped <= sounding_from_start)
    # and real content survives: the decoded windows are mostly the ref
    assert dropped.sum() < 0.05 * ref.sum()


def test_dataconfig_rejects_unknown_encoding():
    with pytest.raises(ValueError, match="encoding"):
        DataConfig(encoding="pitchclass")


def test_config_validate_frame_dim_hint():
    from multinn_tpu.utils import config as cfg_mod
    from multinn_tpu.models.multinn import MultINNConfig
    cfg = cfg_mod.ExperimentConfig(
        data=DataConfig.from_preset("synthetic", encoding="onset_hold"),
        model=MultINNConfig(n_tracks=5, n_pitches=84))
    with pytest.raises(ValueError, match="onset_hold doubles"):
        cfg.validate()
    cfg = cfg_mod.ExperimentConfig(
        data=DataConfig.from_preset("synthetic", encoding="onset_hold"),
        model=MultINNConfig(n_tracks=5, n_pitches=168))
    cfg.validate()


def test_postprocess_gap_fill_and_min_note():
    t_steps, d = 12, 3
    roll = np.zeros((t_steps, 1, d), np.uint8)
    # pitch 0: note with a 1-step gap: on 0-2, off 3, on 4-6
    roll[0:3, 0, 0] = 1
    roll[4:7, 0, 0] = 1
    # pitch 1: isolated 1-step blip
    roll[5, 0, 1] = 1
    # pitch 2: 3-step note (kept by min_note_steps=2)
    roll[2:5, 0, 2] = 1
    out = pr.postprocess_roll(roll, gap_fill_steps=1, min_note_steps=2)
    assert np.all(out[0:7, 0, 0] == 1)            # gap closed -> one note
    assert np.all(out[:, 0, 1] == 0)              # blip dropped
    assert np.all(out[2:5, 0, 2] == 1)            # long note kept
    # gap of 2 NOT closed at gap_fill_steps=1
    roll2 = np.zeros((t_steps, 1, 1), np.uint8)
    roll2[0:2, 0, 0] = 1
    roll2[4:6, 0, 0] = 1
    out2 = pr.postprocess_roll(roll2, gap_fill_steps=1, min_note_steps=0)
    np.testing.assert_array_equal(out2, roll2)
    out3 = pr.postprocess_roll(roll2, gap_fill_steps=2, min_note_steps=0)
    assert np.all(out3[0:6, 0, 0] == 1)
    # batched input: same semantics per sample
    batched = np.stack([roll, roll])
    outb = pr.postprocess_roll(batched, gap_fill_steps=1, min_note_steps=2)
    np.testing.assert_array_equal(outb[0], out)
    np.testing.assert_array_equal(outb[1], out)


# ---------------------------------------------------------------------------
# transposition augmentation (DataConfig.transpose_range)
# ---------------------------------------------------------------------------

def test_transpose_roll_shift_and_zero_fill():
    t, k, d = 4, 2, 8
    roll = np.zeros((t, k, d), np.uint8)
    roll[:, 0, 0] = 1          # lowest pitch, track 0
    roll[:, 1, 7] = 1          # highest pitch, track 1
    up = pr.transpose_roll(roll, 2, d)
    assert up[:, 0, 2].all() and up[:, 0, 0].sum() == 0
    assert up[:, 1].sum() == 0          # pitch 7 + 2 falls off the top
    down = pr.transpose_roll(roll, -1, d)
    assert down[:, 1, 6].all()
    assert down[:, 0].sum() == 0        # pitch 0 - 1 falls off the bottom
    # shift 0 is the identity
    np.testing.assert_array_equal(pr.transpose_roll(roll, 0, d), roll)


def test_transpose_roll_excludes_drum_track():
    t, k, d = 3, 3, 8
    roll = np.zeros((t, k, d), np.uint8)
    roll[:, :, 3] = 1
    out = pr.transpose_roll(roll, 2, d, exclude=(0,))
    np.testing.assert_array_equal(out[:, 0], roll[:, 0])   # drums unshifted
    assert out[:, 1, 5].all() and out[:, 2, 5].all()
    assert out[:, 1, 3].sum() == 0


def test_transpose_roll_onset_hold_blocks_shift_together():
    """In onset_hold space each n_pitches-wide half shifts independently by
    the same amount — transpose-then-encode == encode-then-transpose."""
    rng = np.random.default_rng(0)
    roll = (rng.random((12, 2, 8)) < 0.3).astype(np.uint8)
    enc_then_shift = pr.transpose_roll(pr.encode_onset_hold(roll), 3, 8)
    shift_then_enc = pr.encode_onset_hold(pr.transpose_roll(roll, 3, 8))
    np.testing.assert_array_equal(enc_then_shift, shift_then_enc)


def test_transpose_roll_validates():
    roll = np.zeros((2, 1, 8), np.uint8)
    with pytest.raises(ValueError):
        pr.transpose_roll(roll, 8, 8)       # |shift| >= n_pitches
    with pytest.raises(ValueError):
        pr.transpose_roll(np.zeros((2, 1, 9), np.uint8), 1, 8)  # F % D != 0


def test_dataset_transpose_augmentation():
    # n_tracks=5 so the EXCLUDED track 0 (drums) is nonempty — with an
    # empty excluded track the bit-equality assert would pass even if the
    # Dataset dropped the exclude wiring entirely (round-4 review)
    cfg = DataConfig(n_tracks=5, pitch_min=24, pitch_max=71, window=8,
                     batch_size=4, synthetic_songs=8, synthetic_steps=64,
                     transpose_range=3, transpose_exclude=(0,))
    ds = Dataset(cfg)
    plain = dataclasses.replace(cfg, transpose_range=0)
    ds_plain = Dataset(plain)
    b_aug = next(iter(ds.batches("train", epoch=0, augment=True)))
    b_plain = next(iter(ds_plain.batches("train", epoch=0, augment=True)))
    assert b_aug.shape == b_plain.shape
    # same windows drawn (same shuffle stream), excluded track bit-equal,
    # note mass only ever DROPS under zero-fill transposition
    assert b_plain[:, :, 0].sum() > 0          # guard: exclude is non-vacuous
    np.testing.assert_array_equal(b_aug[:, :, 0], b_plain[:, :, 0])
    assert b_aug[:, :, 4].sum() <= b_plain[:, :, 4].sum()
    # per-window pitch histogram of the melody track is a shift of the
    # original for at least one nonzero-shift window (R=3 over 4 windows:
    # overwhelmingly likely; the assert below is deterministic for this seed)
    assert not np.array_equal(b_aug[:, :, 4], b_plain[:, :, 4])
    # deterministic per (seed, epoch)
    b_again = next(iter(ds.batches("train", epoch=0, augment=True)))
    np.testing.assert_array_equal(b_aug, b_again)
    # different epochs draw different shifts
    b_e1 = next(iter(ds.batches("train", epoch=1, augment=True)))
    assert not np.array_equal(b_aug, b_e1)
    # augmentation is OPT-IN: the same train split WITHOUT augment=True is
    # the true corpus (evaluate.py --split train measures clean data)
    b_noaug = next(iter(ds.batches("train", epoch=0)))
    np.testing.assert_array_equal(b_noaug, b_plain)


def test_dataset_transpose_never_touches_eval_splits():
    cfg = DataConfig(n_tracks=1, pitch_min=24, pitch_max=71, window=8,
                     batch_size=2, synthetic_songs=8, synthetic_steps=64,
                     transpose_range=5)
    ds = Dataset(cfg)
    plain = dataclasses.replace(cfg, transpose_range=0)
    ds_plain = Dataset(plain)
    for split in ("valid", "test"):
        a = next(iter(ds.batches(split, epoch=0, shuffle=False,
                                 drop_remainder=False)))
        b = next(iter(ds_plain.batches(split, epoch=0, shuffle=False,
                                       drop_remainder=False)))
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(ds.seed_windows("valid", 2),
                                  ds_plain.seed_windows("valid", 2))


def test_dataconfig_transpose_validation():
    with pytest.raises(ValueError):
        DataConfig(transpose_range=-1)
    with pytest.raises(ValueError):
        DataConfig(pitch_min=24, pitch_max=27, transpose_range=4)
    with pytest.raises(ValueError):
        DataConfig(n_tracks=2, transpose_exclude=(2,))


# ---------------------------------------------------------------------------
# out-of-core window cache (data/cache.py; --data.source=cache_dir)
# ---------------------------------------------------------------------------

def test_window_cache_exact_dump_roundtrip(tmp_path):
    """write_cache_from_dataset -> cache_dir Dataset is bit-identical to the
    in-memory Dataset (windows, masks, batch stream), and the loaded splits
    stay memory-mapped (the out-of-core contract)."""
    from multinn_tpu.data import cache as cache_mod
    cfg = DataConfig.from_preset("synthetic", synthetic_songs=10,
                                 synthetic_steps=96, window=32, batch_size=4)
    ds = Dataset(cfg)
    out = str(tmp_path / "cache")
    counts = cache_mod.write_cache_from_dataset(ds, out)
    assert counts["train"] == len(ds.windows["train"])

    ds2 = Dataset(dataclasses.replace(cfg, source="cache_dir", path=out))
    for split in ("train", "valid", "test"):
        assert isinstance(ds2.windows[split], np.memmap)
        np.testing.assert_array_equal(np.asarray(ds2.windows[split]),
                                      ds.windows[split])
        np.testing.assert_array_equal(np.asarray(ds2.masks[split]),
                                      ds.masks[split])
    # identical batch stream (same seed/epoch shuffle), uint8 materialized
    a = next(iter(ds.batches("train", epoch=1)))
    b = next(iter(ds2.batches("train", epoch=1)))
    np.testing.assert_array_equal(a, b)
    assert isinstance(b, np.ndarray) and b.dtype == np.uint8
    np.testing.assert_array_equal(ds2.seed_windows("valid", 2),
                                  ds.seed_windows("valid", 2))


def test_window_cache_streamed_matches_inmemory(tmp_path):
    """The STREAMING writer (O(one-song) memory) over a synthetic corpus
    produces the same per-split window MULTISET the in-memory Dataset builds
    (same split fractions/seed; within-split order may differ because the
    streamer appends in song order, so compare sorted window bytes)."""
    from multinn_tpu.data import cache as cache_mod
    cfg = DataConfig.from_preset("synthetic", synthetic_songs=9,
                                 synthetic_steps=80, window=16, batch_size=2)
    out = str(tmp_path / "cache")
    counts = cache_mod.write_cache(out, cfg, cache_mod.iter_synthetic(cfg))
    ds_mem = Dataset(cfg)
    ds_cache = Dataset(dataclasses.replace(cfg, source="cache_dir",
                                           path=out))
    for split in ("train", "valid", "test"):
        assert counts[split] == len(ds_mem.windows[split])
        got = np.asarray(ds_cache.windows[split])
        want = np.asarray(ds_mem.windows[split])

        def keyed(a):
            return sorted(w.tobytes() for w in a)
        assert keyed(got) == keyed(want), split


def test_window_cache_cli_and_midi_dir_stream(tmp_path):
    """prepare_dataset.py: synth a tiny MIDI dir, cachedir-stream it, load
    via source=cache_dir, and iterate a batch."""
    import scripts.prepare_dataset as prep
    mididir = str(tmp_path / "mid")
    assert prep.main(["synth", "--out", mididir, "--songs", "6",
                      "--window", "16"]) == 0
    out = str(tmp_path / "cache")
    assert prep.main(["cachedir", "--source", "midi_dir", "--path", mididir,
                      "--out", out, "--window", "16", "--preset",
                      "synthetic"]) == 0
    cfg = DataConfig.from_preset("synthetic", source="cache_dir", path=out,
                                 window=16, batch_size=2)
    ds = Dataset(cfg)
    assert len(ds.windows["train"]) > 0
    b = next(iter(ds.batches("train")))
    assert b.shape == (2, 16, 5, 84) and b.dtype == np.uint8
    assert b.any()


def test_window_cache_manifest_validation(tmp_path):
    """Mismatched config vs cache manifest fails LOUDLY, naming the field;
    a non-cache directory is rejected."""
    from multinn_tpu.data import cache as cache_mod
    cfg = DataConfig.from_preset("synthetic", synthetic_songs=4,
                                 synthetic_steps=64, window=16)
    out = str(tmp_path / "cache")
    cache_mod.write_cache_from_dataset(Dataset(cfg), out)
    with pytest.raises(ValueError, match="window"):
        Dataset(dataclasses.replace(cfg, source="cache_dir", path=out,
                                    window=32))
    with pytest.raises(ValueError, match="encoding"):
        Dataset(dataclasses.replace(cfg, source="cache_dir", path=out,
                                    encoding="onset_hold"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="manifest"):
        Dataset(dataclasses.replace(cfg, source="cache_dir",
                                    path=str(empty)))


def test_window_cache_onset_hold_encoding(tmp_path):
    """The cache stores MODEL-space windows: an onset_hold cache round-trips
    the doubled frame_dim and decode() recovers frame space."""
    from multinn_tpu.data import cache as cache_mod
    cfg = DataConfig.from_preset("synthetic", synthetic_songs=4,
                                 synthetic_steps=64, window=16,
                                 encoding="onset_hold")
    ds = Dataset(cfg)
    out = str(tmp_path / "cache")
    cache_mod.write_cache(out, cfg, cache_mod.iter_synthetic(cfg))
    ds2 = Dataset(dataclasses.replace(cfg, source="cache_dir", path=out))
    assert ds2.windows["train"].shape[-1] == cfg.frame_dim == 168
    def keyed(a):
        return sorted(w.tobytes() for w in np.asarray(a))
    assert keyed(ds2.windows["train"]) == keyed(ds.windows["train"])
    dec = ds2.decode(np.asarray(ds2.windows["train"][:2]))
    assert dec.shape[-1] == 84


def test_assign_splits_parity_with_dataset():
    """assign_splits must partition song SETS identically to Dataset's
    in-memory re-split for any corpus size (the streamed cache's core
    guarantee; the two implementations are pinned to each other here)."""
    from multinn_tpu.data.cache import song_windows
    from multinn_tpu.data.datasets import assign_splits, synthetic_corpus
    for n in (1, 2, 3, 5, 9, 17, 64):
        cfg = DataConfig.from_preset("synthetic", synthetic_songs=n,
                                     synthetic_steps=48, window=16)
        ds = Dataset(cfg)
        splits = assign_splits(n, cfg.splits, cfg.seed)
        corpus = synthetic_corpus(cfg)
        # reconstruct each split's window multiset from the assignment and
        # compare against the Dataset's re-split windows
        for split in ("train", "valid", "test"):
            want = sorted(w.tobytes()
                          for i, r in enumerate(corpus)
                          if splits[i] == split
                          for w in song_windows(r, cfg)[0])
            got_arr = ds.windows[split]
            # skip fallback-filled splits (empty split borrowed windows)
            if split != "train" and not want:
                continue
            got = sorted(w.tobytes() for w in np.asarray(got_arr))
            assert got == want, (n, split)


def test_window_cache_patched_npy_headers(tmp_path):
    """The streamed .npy files (fixed-width patched row count) are valid
    for BOTH plain np.load and mmap np.load."""
    from multinn_tpu.data import cache as cache_mod
    cfg = DataConfig.from_preset("synthetic", synthetic_songs=5,
                                 synthetic_steps=64, window=16)
    out = str(tmp_path / "c")
    counts = cache_mod.write_cache(out, cfg, cache_mod.iter_synthetic(cfg))
    for split, n in counts.items():
        plain = np.load(f"{out}/{split}.npy")
        mapped = np.load(f"{out}/{split}.npy", mmap_mode="r")
        assert plain.shape == mapped.shape == (n, 16, 5, 84)
        np.testing.assert_array_equal(plain, np.asarray(mapped))
        # no .part spool left behind
    assert not [f for f in __import__("os").listdir(out)
                if f.endswith(".part")]


def test_window_cache_failed_rebuild_preserves_old_cache(tmp_path):
    """A rebuild that dies (unusable corpus) must leave the previous cache
    loadable; a stale-manifest/fresh-arrays mix is rejected loudly."""
    import os

    from multinn_tpu.data import cache as cache_mod
    cfg = DataConfig.from_preset("synthetic", synthetic_songs=5,
                                 synthetic_steps=64, window=16)
    out = str(tmp_path / "c")
    cache_mod.write_cache(out, cfg, cache_mod.iter_synthetic(cfg))

    with pytest.raises(ValueError, match="no train windows"):
        cache_mod.write_cache(out, cfg, iter(()))      # empty corpus
    # old cache fully intact and loadable
    ds = Dataset(dataclasses.replace(cfg, source="cache_dir", path=out))
    assert len(ds.windows["train"]) > 0
    assert not [f for f in os.listdir(out) if f.endswith(".part")]

    # stale manifest + fresh arrays (crash between finalize and manifest):
    # simulate by truncating one array to a different row count
    arr = np.load(f"{out}/train.npy")
    np.save(f"{out}/train.npy", arr[:-1])
    with pytest.raises(ValueError, match="inconsistent"):
        Dataset(dataclasses.replace(cfg, source="cache_dir", path=out))


def test_seed_windows_returns_a_copy():
    """Mutating returned seeds must never write through into the dataset's
    windows (in-memory) nor crash on read-only mmaps (cache_dir)."""
    cfg = DataConfig.from_preset("synthetic", synthetic_songs=6,
                                 synthetic_steps=64, window=16, batch_size=2)
    ds = Dataset(cfg)
    before = np.asarray(ds.windows["valid"][:1]).copy()
    seeds = ds.seed_windows("valid", 1)
    seeds[:] = 0
    np.testing.assert_array_equal(np.asarray(ds.windows["valid"][:1]),
                                  before)
