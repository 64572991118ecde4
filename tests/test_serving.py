"""Serving runtime tests (multinn_tpu/serving + serve.py): continuous
batching coalesces requests into fixed-shape device batches, pipelining
bounds in-flight work, per-request futures resolve with finalized rolls +
provenance, and the stdlib HTTP front end round-trips MIDI/roll payloads.
The reference has no serving layer (SURVEY §1) — this is a beyond-parity
subsystem; tests run the real service on the CPU backend."""

import base64
import http.client
import io
import json
import os
import sys
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multinn_tpu.models import multinn
from multinn_tpu.models.multinn import MultINNConfig
from multinn_tpu.serving import GenerationService, ServeConfig
from multinn_tpu.utils import config as cfg_mod


def tiny_cfg(mode="per-track", decoder="rnn-nade", encoding="frame",
             n_steps=8, w_std=0.01, n_tracks=2):
    data = cfg_mod.DataConfig.from_preset(
        "synthetic", n_tracks=n_tracks, pitch_min=40, pitch_max=63,
        window=16, batch_size=4, synthetic_songs=8, synthetic_steps=64,
        encoding=encoding)
    model = MultINNConfig(n_tracks=n_tracks, n_pitches=data.frame_dim,
                          mode=mode, decoder_type=decoder, n_hidden=16,
                          n_rnn=12, gen_k=2, w_std=w_std)
    gen = cfg_mod.GenerateConfig(n_steps=n_steps, n_samples=1, seed_steps=0)
    return cfg_mod.ExperimentConfig(name="serve", data=data, model=model,
                                    generate=gen).validate()


def make_service(cfg, **kw):
    params = multinn.init(jax.random.PRNGKey(0), cfg.model)
    serve_cfg = ServeConfig(**{"batch": 4, "max_wait_ms": 20.0, **kw})
    return GenerationService(cfg, params, serve_cfg)


def test_service_resolves_requests_with_finalized_rolls():
    cfg = tiny_cfg()
    svc = make_service(cfg)
    try:
        futures = [svc.submit() for _ in range(6)]
        results = [f.result(timeout=60) for f in futures]
        for r in results:
            assert r.roll.shape == (cfg.generate.n_steps, 2,
                                    cfg.model.n_pitches)
            assert r.roll.dtype == np.uint8
            assert set(np.unique(r.roll)) <= {0, 1}
            assert r.total_s >= r.queue_s >= 0
        # 6 requests at batch=4 => exactly 2 batches, 2 padded rows
        st = svc.stats()
        assert st["requests"] == 6
        assert st["batches"] == 2
        assert st["padded_rows"] == 2
        assert st["errors"] == 0
        assert st["latency_ms"]["window"] == 6
        # provenance: rows within a batch are distinct; batch ids consistent
        by_batch = {}
        for r in results:
            by_batch.setdefault(r.batch_index, []).append(r.row)
        assert sorted(by_batch) == [0, 1]
        assert sorted(by_batch[0]) == [0, 1, 2, 3]
        assert sorted(by_batch[1]) == [0, 1]
    finally:
        svc.close()


def test_service_rng_contract_is_reproducible():
    """Batch i samples under fold_in(PRNGKey(seed), i): same submission
    pattern => bit-identical rolls across two service instances."""
    cfg = tiny_cfg()
    rolls = []
    for _ in range(2):
        svc = make_service(cfg, seed=7)
        try:
            futures = [svc.submit() for _ in range(4)]
            rolls.append(np.stack([f.result(60).roll for f in futures]))
        finally:
            svc.close()
    np.testing.assert_array_equal(rolls[0], rolls[1])
    # and the batch key differs from batch 0's on a later batch: generate
    # twice on one service => different batches are (overwhelmingly) distinct
    svc = make_service(cfg, seed=7)
    try:
        a = svc.submit().result(60)
        b = svc.submit().result(60)
        assert a.batch_index != b.batch_index
        assert not np.array_equal(a.roll, b.roll)
    finally:
        svc.close()


def test_service_onset_hold_finalize_decodes_to_frame_space():
    """data.encoding=onset_hold: the service resolves FRAME rolls (D =
    n_pitches/2 after decode), mirroring Generator.finalize."""
    cfg = tiny_cfg(encoding="onset_hold")
    assert cfg.model.n_pitches == 48          # 24 pitches x (onset, hold)
    svc = make_service(cfg)
    try:
        r = svc.submit().result(60)
        assert r.roll.shape == (cfg.generate.n_steps, 2, 24)
    finally:
        svc.close()


def test_service_close_rejects_queued_and_is_idempotent():
    cfg = tiny_cfg()
    svc = make_service(cfg, max_wait_ms=10_000.0, batch=8)
    fut = svc.submit()                         # parked in the wait window
    svc.close()
    svc.close()                                # idempotent
    with pytest.raises(RuntimeError):
        fut.result(timeout=5)
    with pytest.raises(RuntimeError):
        svc.submit()


def test_service_pipeline_depth_bounds_inflight():
    """With pipeline_depth=1 and many single-row batches the service still
    completes everything (the semaphore serializes; no deadlock)."""
    cfg = tiny_cfg()
    svc = make_service(cfg, batch=1, pipeline_depth=1, max_wait_ms=0.0)
    try:
        futures = [svc.submit() for _ in range(5)]
        for f in futures:
            f.result(timeout=60)
        assert svc.stats()["batches"] == 5
    finally:
        svc.close()


@pytest.mark.slow
def test_service_seeded_requests_prime_state():
    """seed_steps>0: seeded requests resolve; the seed influences the
    sample (same base RNG, different seeds => different rolls; identical
    submission pattern across service instances => identical rolls);
    seeded and unseeded requests coalesce into separate batches."""
    # big init weights: FRESH params must condition strongly enough on the
    # primed state that different seeds visibly shift the sampled rolls
    # (at w_std=0.01 the per-dim probability shift is ~1e-3 and 384
    # Bernoulli draws can come out identical)
    cfg = tiny_cfg(w_std=0.8)
    d = cfg.model.n_pitches
    rng = np.random.RandomState(0)
    seed_a = (rng.rand(20, 2, d) < 0.1).astype(np.uint8)
    seed_b = (rng.rand(4, 2, d) < 0.4).astype(np.uint8)  # short: left-pad

    def run_once():
        # wide batching window: all three requests MUST be queued before
        # the first dispatch for the batch-composition asserts to hold
        # (20 ms can elapse between submits on a loaded 1-core box)
        svc = make_service(cfg, seed=3, seed_steps=8, max_wait_ms=500.0)
        try:
            futs = [svc.submit(seed=seed_a), svc.submit(seed=seed_b),
                    svc.submit()]
            res = [f.result(timeout=60) for f in futs]
            st = svc.stats()
            return res, st
        finally:
            svc.close()

    res, st = run_once()
    for r in res:
        assert r.roll.shape == (cfg.generate.n_steps, 2, d)
    # one seeded batch (both seeded requests coalesce) + one unseeded
    assert st["batches"] == 2 and st["seeded_batches"] == 1
    assert res[0].batch_index == res[1].batch_index != res[2].batch_index
    # different seeds produce different continuations (same device batch,
    # different rows -> different RNG streams anyway; so compare across
    # services: same row, same batch key, seed_a vs seed_b)
    svc = make_service(cfg, seed=3, seed_steps=8)
    try:
        only_b = svc.submit(seed=seed_b).result(60)
    finally:
        svc.close()
    assert only_b.batch_index == 0 and only_b.row == 0
    assert not np.array_equal(res[0].roll, only_b.roll)
    # reproducibility: identical submission pattern => identical rolls
    res2, _ = run_once()
    for r1, r2 in zip(res, res2):
        np.testing.assert_array_equal(r1.roll, r2.roll)


def test_service_seed_validation():
    cfg = tiny_cfg()
    d = cfg.model.n_pitches
    svc = make_service(cfg)                    # seed_steps=0
    try:
        with pytest.raises(ValueError, match="seed_steps=0"):
            svc.submit(seed=np.zeros((4, 2, d), np.uint8))
    finally:
        svc.close()
    svc = make_service(cfg, seed_steps=8)
    try:
        with pytest.raises(ValueError, match="frame-space"):
            svc.submit(seed=np.zeros((4, 2, d + 1), np.uint8))
        with pytest.raises(ValueError, match="frame-space"):
            svc.submit(seed=np.zeros((2, d), np.uint8))
    finally:
        svc.close()


def test_service_seeded_onset_hold_encodes_seed():
    """onset_hold model: the service accepts FRAME-space seeds (D = half
    the model dim), encodes internally, and still resolves frame rolls."""
    cfg = tiny_cfg(encoding="onset_hold")
    d_frame = cfg.model.n_pitches // 2
    svc = make_service(cfg, seed_steps=8)
    try:
        seed = np.zeros((6, 2, d_frame), np.uint8)
        seed[:, :, 5] = 1                      # one held note
        r = svc.submit(seed=seed).result(60)
        assert r.roll.shape == (cfg.generate.n_steps, 2, d_frame)
    finally:
        svc.close()


def test_service_survives_drainer_failure():
    """A failing drain (fetch/decode error) rejects THAT batch's futures
    with the error, counts it, releases the pipeline slot, and the service
    keeps serving subsequent batches."""
    cfg = tiny_cfg()
    svc = make_service(cfg)
    try:
        real = svc.generator.fetch_rolls
        calls = [0]

        def flaky(out, size_hint=None):
            calls[0] += 1
            if calls[0] == 1:
                raise RuntimeError("injected drain failure")
            return real(out, size_hint=size_hint)

        svc.generator.fetch_rolls = flaky
        bad = svc.submit()
        with pytest.raises(RuntimeError, match="injected"):
            bad.result(timeout=60)
        ok = svc.submit()                     # service must still work
        r = ok.result(timeout=60)
        assert r.roll.shape[0] == cfg.generate.n_steps
        st = svc.stats()
        assert st["errors"] == 1 and st["batches"] == 2
    finally:
        svc.close()


def test_bitpack_roundtrip_matches_numpy_packbits():
    """ops/bitpack: the device pack matches np.packbits bit-exactly and
    unpack inverts it, incl. a pitch dim that is not a multiple of 8."""
    from multinn_tpu.ops import bitpack
    rng = np.random.RandomState(0)
    for d in (84, 88, 1, 8, 13):
        roll = (rng.rand(3, 5, 2, d) < 0.3).astype(np.uint8)
        packed = np.asarray(bitpack.pack_rolls(roll))
        assert packed.shape == (3, 5, 2, (d + 7) // 8)
        np.testing.assert_array_equal(packed,
                                      np.packbits(roll, axis=-1))
        np.testing.assert_array_equal(bitpack.unpack_rolls(packed, d), roll)


def test_generate_async_packed_matches_unpacked():
    """Generator.generate_async(packed=True) ships the same roll bits."""
    from multinn_tpu.ops import bitpack
    cfg = tiny_cfg()
    params = multinn.init(jax.random.PRNGKey(0), cfg.model)
    from multinn_tpu.training.generator import Generator
    gen = Generator(cfg, params)
    key = jax.random.PRNGKey(7)
    plain = np.asarray(gen.generate_async(key, 8, 4))
    packed = np.asarray(gen.generate_async(key, 8, 4, packed=True))
    np.testing.assert_array_equal(
        bitpack.unpack_rolls(packed, cfg.model.n_pitches), plain)


def test_auto_batch_picks_gate_or_fallback():
    from multinn_tpu.serving import service as svc_mod
    cfg = tiny_cfg()
    b = svc_mod.auto_batch(cfg, cfg.generate.n_steps)
    assert b >= 8                              # fallback floor


@pytest.mark.slow
def test_service_on_mesh_matches_single_device():
    """Serving composes with the parallel layer: a GenerationService over a
    dp×track mesh resolves the same rolls as the single-device service
    (the Generator forces the partitionable XLA paths on a mesh; RNG
    contract is identical)."""
    from multinn_tpu.parallel import mesh as mesh_mod
    from multinn_tpu.parallel.mesh import MeshConfig

    cfg = tiny_cfg()
    params = multinn.init(jax.random.PRNGKey(0), cfg.model)
    mesh = mesh_mod.make_mesh(MeshConfig(use_mesh=True, track=2))
    assert mesh is not None and mesh.size > 1

    def rolls_with(mesh_arg):
        svc = GenerationService(cfg, params,
                                ServeConfig(batch=4, max_wait_ms=200.0,
                                            seed=5), mesh=mesh_arg)
        try:
            futs = [svc.submit() for _ in range(4)]
            return np.stack([f.result(120).roll for f in futs])
        finally:
            svc.close()

    np.testing.assert_array_equal(rolls_with(None), rolls_with(mesh))


@pytest.mark.slow
def test_serve_build_service_restores_checkpoint(tmp_path):
    """serve.py's --run path: train a tiny run to a checkpoint, then build
    the service from the run dir — the serving consumer of the single
    checkpoint artifact (SURVEY §5.4's 'one artifact, three consumers'
    becomes four)."""
    import serve as serve_mod
    import train as train_mod

    run_dir = str(tmp_path / "run")
    rc = train_mod.main(["--preset", "synthetic",
                         "--data.n_tracks=2", "--data.pitch_min=40",
                         "--data.pitch_max=63", "--data.window=16",
                         "--data.batch_size=4", "--data.synthetic_songs=8",
                         "--data.synthetic_steps=64",
                         "--model.n_tracks=2", "--model.n_pitches=24",
                         "--model.decoder_type=rnn-nade",
                         "--model.n_hidden=16", "--model.n_rnn=12",
                         "--model.gen_k=2", "--train.epochs=1",
                         f"--train.run_dir={run_dir}",
                         "--generate.n_steps=8"])
    assert rc == 0
    args, overrides = serve_mod.parse_args(
        ["--run", run_dir, "--batch", "2", "--n-steps", "8"])
    cfg, service = serve_mod.build_service(args, overrides)
    try:
        r = service.submit().result(timeout=120)
        assert r.roll.shape[0] == 8
    finally:
        service.close()


@pytest.mark.slow
def test_http_server_roundtrip(tmp_path):
    """serve.py end to end in-process: --fresh service, /healthz, /stats,
    /generate in both formats; the MIDI payload parses with the first-party
    reader and the roll payload round-trips the npz."""
    import serve as serve_mod
    from multinn_tpu.data import midi as midi_mod

    cfg_path = tmp_path / "serve_cfg.json"
    cfg = tiny_cfg()
    cfg_path.write_text(json.dumps(cfg_mod.to_dict(cfg)))
    args, overrides = serve_mod.parse_args(
        ["--config", str(cfg_path), "--fresh", "--port", "0",
         "--batch", "2", "--max-wait-ms", "5", "--seed-steps", "4"])
    ready = threading.Event()
    box = []
    t = threading.Thread(target=serve_mod.serve,
                         args=(args, overrides, ready, box), daemon=True)
    t.start()
    assert ready.wait(timeout=300), "server failed to start"
    httpd, service = box[0]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", httpd.server_port,
                                          timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["batch"] == 2

        body = json.dumps({"format": "midi", "bpm": 100.0})
        conn.request("POST", "/generate", body=body)
        out = json.loads(conn.getresponse().read())
        assert out["format"] == "midi" and "midi_b64" in out
        mid = midi_mod.loads(base64.b64decode(out["midi_b64"]))
        assert mid.ticks_per_quarter > 0

        conn.request("POST", "/generate", body=json.dumps({"format": "roll"}))
        out = json.loads(conn.getresponse().read())
        with np.load(io.BytesIO(base64.b64decode(out["roll_b64"]))) as z:
            roll = z["roll"]
        assert list(roll.shape) == out["shape"]
        assert roll.shape[0] == cfg.generate.n_steps

        # roll_packed: pitch axis packbits-ed before the npz (the
        # full-song bulk-payload format — 8x less zlib input host-side)
        conn.request("POST", "/generate",
                     body=json.dumps({"format": "roll_packed", "n": 2}))
        out = json.loads(conn.getresponse().read())
        with np.load(io.BytesIO(
                base64.b64decode(out["roll_packed_b64"]))) as z:
            packed = z["packed"]
        d = out["shape"][-1]
        unpacked = np.unpackbits(packed, axis=-1)[..., :d]
        assert list(unpacked.shape) == out["shape"]
        assert set(np.unique(unpacked)) <= {0, 1}

        # bulk request: n songs in one HTTP round trip, stacked npz
        conn.request("POST", "/generate",
                     body=json.dumps({"format": "roll", "n": 3}))
        out = json.loads(conn.getresponse().read())
        with np.load(io.BytesIO(base64.b64decode(out["roll_b64"]))) as z:
            rolls = z["roll"]
        assert rolls.shape == (3, cfg.generate.n_steps, 2,
                               cfg.model.n_pitches)
        assert len(out["provenance"]) == 3 and len(out["latency_ms"]) == 3
        conn.request("POST", "/generate",
                     body=json.dumps({"format": "midi", "n": 2}))
        out = json.loads(conn.getresponse().read())
        assert isinstance(out["midi_b64"], list) and len(out["midi_b64"]) == 2
        for m in out["midi_b64"]:
            midi_mod.loads(base64.b64decode(m))
        conn.request("POST", "/generate",
                     body=json.dumps({"format": "roll", "n": 0}))
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 400

        # seeded request: npz seed roll primes the model state
        seed = np.zeros((6, 2, cfg.model.n_pitches), np.uint8)
        seed[:, :, 3] = 1
        buf = io.BytesIO()
        np.savez_compressed(buf, roll=seed)
        conn.request("POST", "/generate", body=json.dumps(
            {"format": "roll",
             "seed_b64": base64.b64encode(buf.getvalue()).decode()}))
        out = json.loads(conn.getresponse().read())
        assert out["shape"][0] == cfg.generate.n_steps
        conn.request("POST", "/generate", body=json.dumps(
            {"format": "roll", "seed_b64": "not-base64-npz!"}))
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 400

        conn.request("POST", "/generate", body=json.dumps({"format": "x"}))
        resp = conn.getresponse()
        resp.read()                     # drain before keep-alive reuse
        assert resp.status == 400
        conn.request("GET", "/stats")
        st = json.loads(conn.getresponse().read())
        assert st["requests"] >= 2 and st["errors"] == 0
        conn.request("GET", "/nope")
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 404
        conn.close()
    finally:
        httpd.shutdown()
        service.close()
        t.join(timeout=30)


def test_service_accompaniment_requests():
    """accompany_tracks: accompaniment requests resolve with the given
    track passed through bit-exactly; short given rolls right-pad zeros;
    accompany/plain requests coalesce into separate batches; validation
    raises on a disabled service and on seed+given together."""
    cfg = tiny_cfg(mode="feedback", w_std=0.3)
    d = cfg.model.n_pitches
    rng = np.random.RandomState(1)
    given = (rng.rand(10, 2, d) < 0.2).astype(np.uint8)
    svc = make_service(cfg, accompany_tracks=(0,), accompany_steps=10,
                       max_wait_ms=500.0)
    try:
        futs = [svc.submit(given=given), svc.submit(given=given),
                svc.submit()]
        res = [f.result(timeout=120) for f in futs]
        assert res[0].roll.shape == (10, 2, d)        # accompany_steps
        assert res[2].roll.shape == (cfg.generate.n_steps, 2, d)
        np.testing.assert_array_equal(res[0].roll[:, 0], given[:, 0])
        np.testing.assert_array_equal(res[1].roll[:, 0], given[:, 0])
        st = svc.stats()
        assert st["batches"] == 2 and st["accompany_batches"] == 1
        assert st["accompany_tracks"] == [0]
        assert res[0].batch_index == res[1].batch_index != res[2].batch_index
        # short given right-pads silence on the given track
        short = svc.submit(given=given[:4]).result(timeout=120)
        np.testing.assert_array_equal(short.roll[:4, 0], given[:4, 0])
        assert short.roll[4:, 0].sum() == 0
        with pytest.raises(ValueError, match="either a priming seed or"):
            svc.submit(seed=np.zeros((4, 2, d), np.uint8), given=given)
        with pytest.raises(ValueError):
            svc.submit(given=np.zeros((4, 3, d), np.uint8))  # bad shape
    finally:
        svc.close()
    svc2 = make_service(cfg)                      # accompaniment disabled
    try:
        with pytest.raises(ValueError, match="accompany_tracks"):
            svc2.submit(given=given)
    finally:
        svc2.close()


@pytest.mark.slow
def test_http_accompaniment_roundtrip(tmp_path):
    """serve.py --accompany-tracks end to end in-process: given_b64 request
    returns a roll whose given track equals the request's."""
    import serve as serve_mod

    cfg_path = tmp_path / "serve_acc_cfg.json"
    # 3 tracks, tracks {0, 1} given: keeps a NONZERO given index under
    # serving-layer test (the npz payload can address it directly; the
    # MIDI payload's content collapses to track 0 at K != 5)
    cfg = tiny_cfg(mode="feedback", n_tracks=3)
    cfg_path.write_text(json.dumps(cfg_mod.to_dict(cfg)))
    args, overrides = serve_mod.parse_args(
        ["--config", str(cfg_path), "--fresh", "--port", "0",
         "--batch", "2", "--max-wait-ms", "5",
         "--accompany-tracks", "0,1", "--accompany-steps", "8"])
    ready = threading.Event()
    box = []
    t = threading.Thread(target=serve_mod.serve,
                         args=(args, overrides, ready, box), daemon=True)
    t.start()
    assert ready.wait(timeout=300), "server failed to start"
    httpd, service = box[0]
    try:
        d = cfg.model.n_pitches
        given = np.zeros((8, 3, d), np.uint8)
        given[:, 0, 5] = 1
        given[::2, 1, 9] = 1                   # nonzero given index
        buf = io.BytesIO()
        np.savez_compressed(buf, roll=given)
        conn = http.client.HTTPConnection("127.0.0.1", httpd.server_port,
                                          timeout=120)
        conn.request("POST", "/generate", body=json.dumps(
            {"format": "roll",
             "given_b64": base64.b64encode(buf.getvalue()).decode()}))
        out = json.loads(conn.getresponse().read())
        with np.load(io.BytesIO(base64.b64decode(out["roll_b64"]))) as z:
            roll = z["roll"]
        assert roll.shape == (8, 3, d)
        np.testing.assert_array_equal(roll[:, 0], given[:, 0])
        np.testing.assert_array_equal(roll[:, 1], given[:, 1])
        st = service.stats()
        assert st["accompany_batches"] == 1
        # MIDI given (r5): raw SMF bytes, quantized through the service's
        # own grid/track spec server-side. At K != 5 every instrument maps
        # to track 0, so only track 0's melody survives the round trip;
        # the fixed track 1 is then (exactly) silence
        from multinn_tpu.data import midi as midi_mod
        from multinn_tpu.data import pianoroll as pr
        # 64 steps of melody against accompany_steps=8: the handler's
        # decode cap bounds the quantized roll before normalization
        mid_bytes = midi_mod.dumps(pr.roll_to_midi(
            np.tile(given[:, :1], (8, 1, 1)), cfg.data.spec()))
        conn.request("POST", "/generate", body=json.dumps(
            {"format": "roll",
             "given_b64": base64.b64encode(mid_bytes).decode()}))
        out = json.loads(conn.getresponse().read())
        with np.load(io.BytesIO(base64.b64decode(out["roll_b64"]))) as z:
            roll_m = z["roll"]
        assert roll_m.shape == (8, 3, d)
        np.testing.assert_array_equal(roll_m[:, 0], given[:, 0])
        np.testing.assert_array_equal(roll_m[:, 1], np.zeros((8, d)))
        # bad payload -> 400
        conn.request("POST", "/generate",
                     body=json.dumps({"given_b64": "!!notbase64npz!!"}))
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 400
        conn.close()
    finally:
        httpd.shutdown()
        service.close()
        t.join(timeout=30)


def test_submit_many_zero_is_a_graceful_noop():
    """submit_many(0) returns [] (it used to raise IndexError deriving the
    queue kind from reqs[0] — round-4 review); the service keeps serving."""
    cfg = tiny_cfg()
    svc = make_service(cfg)
    try:
        assert svc.submit_many(0) == []
        assert svc.submit_many(0, seed=None, given=None) == []
        r = svc.submit().result(timeout=60)    # still alive
        assert r.roll.dtype == np.uint8
    finally:
        svc.close()


def test_generate_async_sparse_matches_packed():
    """packed="sparse" (sparse-byte transport, ops/sparsebytes) decodes
    to the same roll bits as the packed frame transport, through
    fetch_rolls — with or without a size_hint (too-small hints refetch,
    never corrupt)."""
    cfg = tiny_cfg()
    params = multinn.init(jax.random.PRNGKey(0), cfg.model)
    from multinn_tpu.training.generator import Generator
    gen = Generator(cfg, params)
    key = jax.random.PRNGKey(7)
    want = gen.fetch_rolls(gen.generate_async(key, 8, 4, packed=True))
    out = gen.generate_async(key, 8, 4, packed="sparse")
    assert isinstance(out, dict)
    np.testing.assert_array_equal(gen.fetch_rolls(out), want)
    assert gen.last_sparse_count == int(np.asarray(out["count"]))
    # size_hint paths: generous (single fetch) and too-small (refetch)
    np.testing.assert_array_equal(
        gen.fetch_rolls(out, size_hint=gen.last_sparse_count), want)
    np.testing.assert_array_equal(gen.fetch_rolls(out, size_hint=0), want)


def test_fetch_sparse_overflow_falls_back_to_packed():
    """A truncated record buffer (count > cap) must be detected:
    fetch_rolls silently serves the packed fallback instead."""
    from multinn_tpu.ops import bitpack, sparsebytes as sb
    cfg = tiny_cfg()
    params = multinn.init(jax.random.PRNGKey(0), cfg.model)
    from multinn_tpu.training.generator import Generator
    gen = Generator(cfg, params)
    rng = np.random.RandomState(3)
    # dense roll: far more nonzero bytes than a tiny cap
    roll = (rng.rand(2, 8, 2, cfg.model.n_pitches) < 0.5).astype(np.uint8)
    pk = jnp.asarray(np.packbits(roll, axis=-1))
    buf, count = sb.sparse_pack(pk, cap=4)
    out = {"sparse": buf, "count": count, "packed": pk}
    assert int(np.asarray(count)) > 4
    np.testing.assert_array_equal(gen.fetch_rolls(out), roll)
    np.testing.assert_array_equal(gen.fetch_rolls(out, size_hint=2), roll)


def test_service_sparse_transport_matches_packed():
    """A service on the sparse transport resolves the same rolls as one
    on the packed transport (same seed, same one-full-batch arrival)."""
    cfg = tiny_cfg()
    rolls = {}
    for transport in ("packed", "sparse"):
        svc = make_service(cfg, transport=transport)
        try:
            assert svc.stats()["transport"] == transport
            futures = svc.submit_many(4)
            rolls[transport] = np.stack(
                [f.result(timeout=60).roll for f in futures])
        finally:
            svc.close()
    np.testing.assert_array_equal(rolls["sparse"], rolls["packed"])


def test_transport_auto_resolution():
    from multinn_tpu.serving import service as svc_mod
    cfg = tiny_cfg()
    # tiny payload -> packed; huge payload -> sparse
    assert svc_mod._resolve_transport("auto", cfg, 4, 8) is True
    assert svc_mod._resolve_transport("auto", cfg, 128, 8192) == "sparse"
    assert svc_mod._resolve_transport("packed", cfg, 128, 8192) is True
    assert svc_mod._resolve_transport("sparse", cfg, 4, 8) == "sparse"
    with pytest.raises(ValueError, match="transport"):
        svc_mod._resolve_transport("zstd", cfg, 4, 8)


def test_sparse_transport_demotes_on_dense_model(monkeypatch):
    """A model too dense for the sparse codec (every batch overflows the
    record buffer) serves correctly through the packed fallback and,
    after two consecutive overflows, demotes the service to the packed
    transport permanently. (Tiny test rolls can never overflow the real
    record_cap — its whole-chunk rounding floors the buffer at 262144
    rows — so pin the cap below the dense roll's nonzero-byte count.)"""
    from multinn_tpu.ops import sparsebytes
    monkeypatch.setattr(sparsebytes, "record_cap", lambda size, chunk=0: 4)
    cfg = tiny_cfg(w_std=3.0)          # big weights -> ~50% density
    svc = make_service(cfg, transport="sparse")
    try:
        for f in svc.submit_many(4):   # batch 1
            f.result(timeout=60)
        for f in svc.submit_many(4):   # batch 2 -> second overflow
            f.result(timeout=60)
        st = svc.stats()
        # the dispatch program stays sparse (no mid-serving cold compile);
        # the drain reads the packed fallback directly once demoted
        assert st["transport"] == "sparse"
        assert st["transport_demoted"] is True
        assert st["errors"] == 0
        # still serving fine after the demotion
        r = svc.submit().result(timeout=60)
        assert set(np.unique(r.roll)) <= {0, 1}
    finally:
        svc.close()


def test_sparse_transport_with_onset_hold_encoding():
    """Sparse transport composes with data.encoding=onset_hold: the
    drain decodes records -> packed -> model-space roll -> frame roll."""
    cfg = tiny_cfg(encoding="onset_hold")
    svc = make_service(cfg, transport="sparse")
    try:
        r = svc.submit().result(60)
        assert r.roll.shape == (cfg.generate.n_steps, 2, 24)
        assert set(np.unique(r.roll)) <= {0, 1}
        assert svc.stats()["errors"] == 0
    finally:
        svc.close()
