"""Musical metric tests (SURVEY C16): hand-constructed pianorolls with known
statistics."""

import numpy as np
import pytest

from multinn_tpu.eval import musical


def test_empty_bar_ratio():
    rolls = np.zeros((1, 32, 2, 12), np.uint8)   # 2 bars of 16 steps
    rolls[0, 0, 0, 5] = 1                        # track 0, bar 0 active
    eb = musical.empty_bar_ratio(rolls, steps_per_bar=16)
    np.testing.assert_allclose(eb, [0.5, 1.0])


def test_used_pitch_classes():
    rolls = np.zeros((1, 16, 1, 24), np.uint8)
    # pitch_min=0: indices 0 (C), 4 (E), 7 (G), 12 (C again) -> 3 classes
    for p in (0, 4, 7, 12):
        rolls[0, 0, 0, p] = 1
    upc = musical.used_pitch_classes_per_bar(rolls, 16, pitch_min=0)
    np.testing.assert_allclose(upc, [3.0])


def test_qualified_note_ratio():
    rolls = np.zeros((1, 16, 1, 4), np.uint8)
    rolls[0, 0:4, 0, 0] = 1     # length 4 (qualified)
    rolls[0, 8:9, 0, 1] = 1     # length 1 (not)
    qn = musical.qualified_note_ratio(rolls, min_steps=3)
    np.testing.assert_allclose(qn, [0.5])


def test_drum_pattern_ratio():
    rolls = np.zeros((1, 16, 1, 8), np.uint8)
    rolls[0, 0, 0, 0] = 1       # on 8th grid (step 0)
    rolls[0, 2, 0, 0] = 0       # gap keeps separate onsets
    rolls[0, 4, 0, 1] = 1       # on grid
    rolls[0, 5, 0, 2] = 1       # off grid
    dp = musical.drum_pattern_ratio(rolls, drum_track=0)
    np.testing.assert_allclose(dp, 2 / 3)


def test_tonal_distance_identical_tracks_is_zero():
    rng = np.random.default_rng(0)
    roll = (rng.random((2, 32, 1, 24)) < 0.1).astype(np.uint8)
    rolls = np.concatenate([roll, roll], axis=2)    # identical tracks
    td = musical.tonal_distance(rolls, 0, 1, steps_per_bar=16, pitch_min=0)
    assert td == pytest.approx(0.0, abs=1e-9)
    # C major triad vs C# major triad must be > 0
    a = np.zeros((1, 16, 2, 24), np.uint8)
    for p in (0, 4, 7):
        a[0, :, 0, p] = 1
        a[0, :, 1, p + 1] = 1
    assert musical.tonal_distance(a, 0, 1, 16, 0) > 0.1


def test_polyphony_and_density():
    rolls = np.zeros((1, 4, 1, 8), np.uint8)
    rolls[0, 0, 0, :3] = 1      # 3 simultaneous
    rolls[0, 1, 0, 0] = 1       # 1
    poly = musical.polyphony_rate(rolls)
    np.testing.assert_allclose(poly, [0.5])
    nd = musical.note_density(rolls)
    np.testing.assert_allclose(nd, [1.0])     # 4 cells / 4 steps


def test_evaluate_rolls_full_report():
    rng = np.random.default_rng(1)
    rolls = (rng.random((2, 64, 5, 84)) < 0.05).astype(np.uint8)
    rep = musical.evaluate_rolls(rolls, steps_per_bar=16, pitch_min=24,
                                 drum_track=0)
    assert len(rep["empty_bar_ratio"]) == 5
    assert "drum_pattern_ratio" in rep
    assert "0-1" not in rep["tonal_distance"]          # drums excluded
    assert "1-2" in rep["tonal_distance"]
    assert all(np.isfinite(v) for v in rep["tonal_distance"].values())


def test_compare_rolls_significance():
    """Same-distribution sets -> small effect sizes; clearly different
    density -> large |d| with small normal-approx p."""
    rng = np.random.default_rng(2)
    a = (rng.random((8, 64, 3, 24)) < 0.05).astype(np.uint8)
    b = (rng.random((8, 64, 3, 24)) < 0.05).astype(np.uint8)
    dense = (rng.random((8, 64, 3, 24)) < 0.4).astype(np.uint8)
    same = musical.compare_rolls(a, b, steps_per_bar=16, pitch_min=0)
    assert abs(same["note_density"]["effect_size_d"]) < 1.5
    diff = musical.compare_rolls(dense, b, steps_per_bar=16, pitch_min=0)
    assert abs(diff["note_density"]["effect_size_d"]) > 3.0
    assert diff["note_density"]["p_normal_approx"] < 0.01
    assert diff["note_density"]["n"] == [8, 8]
    # per-sample stats have one observation per song
    ps = musical.per_sample_stats(a, steps_per_bar=16, drum_track=0)
    assert ps["note_density"].shape == (8,)
    assert "drum_pattern_ratio" in ps
