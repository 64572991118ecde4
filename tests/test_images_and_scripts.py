"""Pianoroll PNG summaries (C19/§5.5) and dataset-prep scripts (C21)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from multinn_tpu.utils import images

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_render_pianoroll():
    roll = np.zeros((8, 2, 12), np.uint8)
    roll[0, 0, 3] = 1
    roll[2, 1, 7] = 1
    img = images.render_pianoroll(roll, scale=1)
    assert img.shape == (12, 8, 3)
    # pitch 3 renders at row (12-1-3)=8 in track-0 color, red-dominant
    assert img[8, 0, 0] > 0
    assert img[12 - 1 - 7, 2, 2] > 0      # track 1 blue at pitch 7, t=2
    assert img.sum() == (np.array([230, 60, 60]).sum()
                         + np.array([60, 120, 230]).sum())


def test_save_pianoroll_png(tmp_path):
    roll = (np.random.default_rng(0).random((16, 3, 24)) < 0.1).astype(
        np.uint8)
    p = images.save_pianoroll_png(roll, str(tmp_path / "x.png"))
    from PIL import Image
    im = Image.open(p)
    assert im.size == (16 * 2, 24 * 2)


def test_prepare_dataset_synth_cache_roundtrip(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    midi_dir = str(tmp_path / "midi")
    npz = str(tmp_path / "rolls.npz")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/prepare_dataset.py"),
         "synth", "--out", midi_dir, "--songs", "2"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert len(os.listdir(midi_dir)) == 2
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/prepare_dataset.py"),
         "cache", "--preset", "lpd5", "--source", "midi_dir",
         "--path", midi_dir, "--out", npz],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    data = np.load(npz)
    # cache preserves the split assignment (per-split keys)
    assert set(data.files) == {"rolls_train", "rolls_valid", "rolls_test"}
    assert data["rolls_train"].shape[2:] == (5, 84)
    # reloading respects the cached split
    from multinn_tpu.data.datasets import DataConfig, Dataset
    ds = Dataset(DataConfig.from_preset("lpd5", source="npz", path=npz))
    assert len(ds.windows["train"]) == len(data["rolls_train"])


@pytest.mark.slow
def test_ingest_bench_script(tmp_path):
    """Corpus-scale ingest bench (C1 readiness) runs and reports sane
    rates at a small file count."""
    import json
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/ingest_bench.py"),
         "--files", "64", "--python-files", "16"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["files"] == 64
    assert out["native_files_per_sec"] > out["python_files_per_sec"] > 0


@pytest.mark.slow
def test_compile_audit_script_cpu():
    """Persistent-cache audit mechanics (VERDICT r3 #1): two fresh child
    processes; run 2 must HIT the cache run 1 populated. CPU platform +
    throwaway cache dir — the TPU numbers live in BASELINE/BENCH."""
    import json
    import tempfile
    with tempfile.TemporaryDirectory() as cache:
        env = dict(os.environ, MULTINN_COMPILE_CACHE=cache)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/compile_audit.py"),
             "--programs", "train", "--platform", "cpu"],
            capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["train"]["warm_hit"] is True, out
    assert out["train"]["compile_s"][1] < out["train"]["compile_s"][0]
    ev2 = out["train"]["cache_events"][1]
    assert ev2.get("cache_misses", 0) == 0, out


def test_cpu_reference_bench_tiny():
    """The torch-CPU reference stand-in (scripts/cpu_reference_bench.py)
    must run and train: both steps return finite losses at tiny shapes."""
    import importlib.util as ilu
    import os
    spec = ilu.spec_from_file_location(
        "cpu_reference_bench",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "cpu_reference_bench.py"))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import math
    s, frames, loss = mod.bench_rbm(k_tracks=2, d=6, h=5, u=4, b=2, t=3,
                                    iters=1)
    assert s > 0 and frames == 6 and math.isfinite(loss)
    s, frames, loss = mod.bench_nade(k_tracks=2, d=6, h=5, u=4, b=2, t=3,
                                     iters=1)
    assert s > 0 and frames == 6 and math.isfinite(loss)


@pytest.mark.slow
def test_cpu_reference_bench_tf1_tiny():
    """The TF1-compat reference measurement (--impl tf1) builds the real
    graph-mode Session/feed_dict/while_loop program and trains: finite
    losses at tiny shapes. Skips if this image's tensorflow breaks."""
    pytest.importorskip("tensorflow")
    import importlib.util as ilu
    import os
    spec = ilu.spec_from_file_location(
        "cpu_reference_bench",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "cpu_reference_bench.py"))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import math
    s, frames, loss = mod.bench_rbm_tf1(k_tracks=2, d=6, h=5, u=4, b=2, t=3,
                                        iters=1)
    assert s > 0 and frames == 6 and math.isfinite(loss)
    s, frames, loss = mod.bench_nade_tf1(k_tracks=2, d=6, h=5, u=4, b=2, t=3,
                                         iters=1)
    assert s > 0 and frames == 6 and math.isfinite(loss)


def _load_script(name):
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        name, os.path.join(os.path.dirname(__file__), "..", "scripts",
                           f"{name}.py"))
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_soak_report_math():
    """soak_report: RSS growth measured AFTER the first sample window
    (startup/compile allocations are expected), latency drift =
    last-vs-first-quarter mean ratio."""
    mod = _load_script("serve_loadtest")
    samples = [{"t_s": 0.0, "rss_mb": 300.0, "fds": 12, "done": 0},
               {"t_s": 2.0, "rss_mb": 320.0, "fds": 12, "done": 10},
               {"t_s": 4.0, "rss_mb": 321.0, "fds": 13, "done": 30}]
    lat = [0.1] * 8 + [0.2] * 8
    rep = mod.soak_report(lat, samples)
    assert rep["rss_growth_after_warmup_mb"] == 1.0   # 321 - 320, not -300
    assert rep["fds_first"] == 12 and rep["fds_last"] == 13
    assert rep["latency_drift_last_vs_first_quarter"] == 2.0
    # degenerate inputs don't crash
    rep = mod.soak_report([0.1], samples[:1])
    assert rep["latency_drift_last_vs_first_quarter"] == 1.0
    assert rep["rss_growth_after_warmup_mb"] == 0.0


def test_loadtest_rejects_http_soak():
    """--http --soak must refuse loudly, not silently run a short
    closed-loop test labeled as a soak (round-4 review)."""
    mod = _load_script("serve_loadtest")
    rc = mod.main(["--http", "--soak", "5"])
    assert rc == 2


@pytest.mark.slow
def test_real_corpus_drill_standin(tmp_path):
    """scripts/real_corpus_drill.py: the one-command drill runs the
    shipped JSB config end-to-end on the synthetic stand-in and emits the
    anchor-comparison report; corpora without data are reported, not
    crashed."""
    import scripts.real_corpus_drill as drill

    run_root = str(tmp_path / "runs")
    rc = drill.main([
        "--corpus", "jsb", "--data-root", str(tmp_path / "data"),
        "--synthetic-standin", "--run-root", run_root,
        # tiny-model overrides forwarded to train.py
        "--model.n_hidden=16", "--model.n_rnn=12", "--model.gen_k=2",
        "--train.epochs=1", "--train.steps_per_call=2",
        "--train.ckpt_every_steps=0",
        "--generate.n_steps=48", "--generate.seed_steps=8",
    ])
    assert rc == 0
    with open(os.path.join(run_root, "drill_report.json")) as f:
        rep = json.load(f)
    row = rep["jsb_rnnrbm_standin"]       # stand-ins get their own run dirs
    assert row["synthetic_standin"] is True
    assert np.isfinite(row["ll_per_frame"])
    assert row["paper_anchor"]["test_ll_per_frame_2012"] == -6.27

    # no data + no stand-in: actionable skip, exit 3
    rc = drill.main(["--corpus", "nottingham",
                     "--data-root", str(tmp_path / "empty"),
                     "--run-root", run_root])
    assert rc == 3

    # an explicit path that does not exist fails loudly (never degrades
    # to "no data" or a silently substituted stand-in)
    with pytest.raises(SystemExit, match="does not exist"):
        drill.main(["--corpus", "jsb", "--jsb", str(tmp_path / "nope.pkl"),
                    "--run-root", run_root])

    # a run dir trained on different data refuses to silently resume
    other = str(tmp_path / "data" / "other.pkl")
    import shutil
    shutil.copy(os.path.join(str(tmp_path / "data"), "jsb_synth.pkl"),
                other)
    with pytest.raises(SystemExit, match="remove it or pass"):
        drill.main(["--corpus", "jsb", "--jsb", other,
                    "--run-root", run_root,
                    "--synthetic-standin", "--train.epochs=1"])


@pytest.mark.slow
def test_serve_transport_ab_script(tmp_path):
    """scripts/serve_transport_ab.py runs end-to-end on a tiny trained
    run (CPU): both transports resolve, medians are reported."""
    import train as train_cli
    import scripts.serve_transport_ab as ab

    run_dir = str(tmp_path / "ab_run")
    rc = train_cli.main([
        "--preset", "synthetic", "--data.n_tracks=2",
        "--model.n_tracks=2", "--data.window=16",
        "--data.batch_size=4", "--data.synthetic_songs=8",
        "--data.synthetic_steps=64", "--model.n_hidden=16",
        "--model.n_rnn=12", "--model.gen_k=2", "--train.epochs=1",
        "--train.steps_per_call=2", "--train.ckpt_every_steps=0",
        f"--train.run_dir={run_dir}",
    ])
    assert rc == 0
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = ab.main(["--run", run_dir, "--batch", "2", "--n-steps", "8",
                      "--rounds", "1", "--batches-per-round", "1"])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["packed_songs_per_s_median"] > 0
    assert rep["sparse_songs_per_s_median"] > 0


def test_bench_compare_bound_aware(tmp_path):
    """scripts/bench_compare.py classifies deltas by boundedness: a
    device-bound slowdown is a regression; a link-bound swing inside the
    spread envelopes is weather; beyond both envelopes it regresses."""
    import scripts.bench_compare as bc

    def rec(gen_s, link_rate, link_min, link_max):
        return {"metric": "gen_latency_64bar_5track", "value": gen_s,
                "unit": "s", "vs_baseline": 1.0 / gen_s, "extra": {
                    "gen_latency_64bar_5track_s": gen_s,
                    "serving_service_musical_packed_songs_per_sec":
                        link_rate,
                    "serving_service_musical_packed_spread": {
                        "min": link_min, "max": link_max, "n_rounds": 3},
                    "serving_service_musical_bound": "host-link"}}

    old = tmp_path / "old.json"
    old.write_text(json.dumps(rec(0.030, 200.0, 100.0, 250.0)))

    def run(new_rec):
        new = tmp_path / "new.json"
        new.write_text(json.dumps(new_rec))
        import io
        from contextlib import redirect_stdout
        buf = io.StringIO()
        with redirect_stdout(buf):
            assert bc.main([str(old), str(new)]) == 0
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        return {r["metric"]: r for r in out["rows"]}, out["regressions"]

    # link rate halves but stays inside the old spread envelope -> weather;
    # device latency doubles -> the ONLY regression
    rows, regs = run(rec(0.060, 110.0, 95.0, 240.0))
    assert regs == ["gen_latency_64bar_5track_s"]
    assert rows["serving_service_musical_packed_songs_per_sec"][
        "verdict"] == "link-weather"
    # link rate collapses BEYOND both spread envelopes -> flagged (but not
    # in the device-bound regressions list)
    rows, regs = run(rec(0.030, 40.0, 30.0, 50.0))
    assert rows["serving_service_musical_packed_songs_per_sec"][
        "verdict"] == "regressed(beyond-spread)"
    assert regs == []


def test_bench_compare_loads_driver_record():
    """The comparator accepts the driver's pretty-printed BENCH_r{N}.json
    shape and compares it against a bench stdout line."""
    import io
    from contextlib import redirect_stdout

    import scripts.bench_compare as bc

    src = os.path.join(REPO, "BENCH_r03.json")
    if not os.path.exists(src):
        pytest.skip("no driver BENCH record in repo")
    rec = bc.load_record(src)
    assert "extra" in rec
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert bc.main([src, src]) == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["n_compared"] > 5 and out["regressions"] == []
