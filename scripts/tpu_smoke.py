#!/usr/bin/env python
"""Hardware smoke check (run manually on a real TPU; the pytest suite runs on
a CPU mesh and cannot catch Mosaic-only lowering issues):

    python scripts/tpu_smoke.py

Compiles + runs every TPU-only path: both Pallas sampling kernels, the
whole-generation fused kernels across feedback/per-track/joint modes,
stacked and vanilla cells, DBN encoders and the bf16 capacity batch, a
Hessian-free macro-step, a fused multi-step train program, and a
single-chip eval step, and the track-conditional accompaniment paths
(fused + scan/where-merge) with bit-exact passthrough. Prints one
PASS/FAIL line per item; exits nonzero on any failure. Budget ~5-10 min warm cache (first-compile cold start:
see BASELINE.md notes).
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print(f"SKIP: backend is {jax.default_backend()}, not tpu")
        return 0

    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig
    from multinn_tpu.utils import profiling
    from multinn_tpu.nn import nade as nade_nn, rbm as rbm_nn
    from multinn_tpu.ops import gibbs_pallas, nade_pallas

    failures = []

    def check(name, fn):
        t0 = time.time()
        try:
            fn()
            print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception:
            failures.append(name)
            print(f"FAIL {name}", flush=True)
            traceback.print_exc()

    def gibbs_kernel():
        p = rbm_nn.init(jax.random.PRNGKey(0), 84, 150, w_std=0.3)
        v0 = jax.random.bernoulli(jax.random.PRNGKey(1), 0.2,
                                  (512, 84)).astype(jnp.float32)
        vk = gibbs_pallas.gibbs_chain(jax.random.PRNGKey(2), v0, p.w, p.bv,
                                      p.bh, k=5)
        assert 0.0 < float(vk.mean()) < 1.0

    def nade_kernel():
        p = nade_nn.init(jax.random.PRNGKey(0), 84, 150, w_std=0.2)
        xs = nade_pallas.sample(jax.random.PRNGKey(1), p.w, p.v, p.bv, p.bh,
                                batch_shape=(8,))
        assert xs.shape == (8, 84)

    def nade_ll_kernel():
        # grid-free exact-LL training kernel (r4): loss AND grads must match
        # the XLA tri form on the chip (real Mosaic lowering, fwd + bwd)
        from multinn_tpu.ops import nade_ll_pallas
        p = nade_nn.init(jax.random.PRNGKey(0), 84, 150, w_std=0.2)
        keys = jax.random.split(jax.random.PRNGKey(1), 3)
        x = jax.random.bernoulli(keys[0], 0.1, (96, 84)).astype(jnp.float32)
        bv = 0.1 * jax.random.normal(keys[1], (96, 84))
        bh = 0.1 * jax.random.normal(keys[2], (96, 150))

        def nll(logits_fn, w, v):
            logits = logits_fn(x, w, v, bv, bh)
            return -jnp.mean(x * jax.nn.log_sigmoid(logits)
                             + (1 - x) * jax.nn.log_sigmoid(-logits))

        ker = jax.jit(jax.value_and_grad(
            lambda w, v: nll(nade_ll_pallas.nade_logits, w, v), (0, 1)))
        ref = jax.jit(jax.value_and_grad(
            lambda w, v: nll(
                lambda *a: nade_nn.conditionals_logits(*a, form="tri"),
                w, v), (0, 1)))
        lk, gk = ker(p.w, p.v)
        lr, gr = ref(p.w, p.v)
        profiling.force(lk)
        assert abs(float(lk) - float(lr)) < 1e-4
        for a, b in zip(gk, gr):
            err = float(jnp.max(jnp.abs(a - b)))
            assert err < 1e-3, err

    def fused(dec, mode, batch=1, **kw):
        def run():
            cfg = MultINNConfig(n_tracks=5, n_pitches=84, mode=mode,
                                decoder_type=dec, n_hidden=150, n_rnn=100,
                                cd_k=1, gen_k=10, **kw)
            params = multinn.init(jax.random.PRNGKey(0), cfg)
            st = multinn.init_state(params, batch)
            _, roll = multinn.generate(params, jax.random.PRNGKey(1), st,
                                       128, fused=True)
            profiling.force(roll)
            assert roll.shape == (batch, 128, 5, 84)
        return run

    def train_multi():
        from multinn_tpu.data.datasets import DataConfig
        from multinn_tpu.training.trainer import Trainer
        from multinn_tpu.utils import config as cfg_mod
        import numpy as np
        import tempfile
        with tempfile.TemporaryDirectory() as tmp:
            cfg = cfg_mod.ExperimentConfig(
                name="smoke",
                data=DataConfig.from_preset("synthetic", synthetic_songs=8,
                                            synthetic_steps=64, window=16,
                                            batch_size=4),
                model=MultINNConfig(n_tracks=5, n_pitches=84,
                                    mode="feedback", decoder_type="rnn-rbm",
                                    n_hidden=64, n_rnn=64, gen_k=3),
                train=cfg_mod.TrainConfig(epochs=1, steps_per_call=2,
                                          ckpt_every_steps=0, run_dir=tmp),
            ).validate()
            t = Trainer(cfg)
            t.train_epoch()
            ev = t.evaluate("valid")
            assert np.isfinite(ev["loss"])
            t.close()

    def fused_multilayer():
        # 2-layer stacked cells through the fused NADE kernel (the RBM
        # 2-layer flagship exceeds the VMEM budget and falls back — the
        # NADE one exercises the stacked-layer kernel path on hardware)
        cfg = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                            decoder_type="rnn-nade", n_hidden=150,
                            n_rnn=100, rnn_layers=2)
        from multinn_tpu.ops import gen_fused
        assert gen_fused.supported_nade(cfg, 1)
        params = multinn.init(jax.random.PRNGKey(0), cfg)
        st = multinn.init_state(params, 1)
        _, roll = multinn.generate(params, jax.random.PRNGKey(1), st, 64,
                                   fused=True)
        profiling.force(roll)
        assert roll.shape == (1, 64, 5, 84)

    def accomp(fused, subset=True):
        # track-conditional generation on hardware (r4/r5): the fused
        # kernels stream the given tracks' teacher features; the scan path
        # with subset=False exercises the where-select merge (ADVICE r4 —
        # NaN-robust passthrough). Given tracks must pass through
        # BIT-EXACTLY either way.
        def run():
            import numpy as np
            cfg = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                                decoder_type="rnn-rbm", n_hidden=150,
                                n_rnn=100, cd_k=1, gen_k=10)
            params = multinn.init(jax.random.PRNGKey(0), cfg)
            st = multinn.init_state(params, 2)
            giv = jax.random.bernoulli(
                jax.random.PRNGKey(3), 0.06,
                (2, 64, 5, 84)).astype(jnp.float32)
            _, roll = multinn.generate_accompaniment(
                params, jax.random.PRNGKey(1), st, giv, (0, 2),
                fused=fused, subset=subset)
            profiling.force(roll)
            r = np.asarray(roll)
            g = np.asarray(giv)
            np.testing.assert_array_equal(r[:, :, 0], g[:, :, 0])
            np.testing.assert_array_equal(r[:, :, 2], g[:, :, 2])
            sampled = r[:, :, (1, 3, 4)]
            assert 0.0 < sampled.mean() < 1.0
        return run

    def hf_step():
        from multinn_tpu.training import hf
        cfg = MultINNConfig(n_tracks=3, n_pitches=24, mode="feedback",
                            decoder_type="rnn-nade", n_hidden=32, n_rnn=16)
        params = multinn.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.bernoulli(jax.random.PRNGKey(1), 0.1,
                                 (4, 16, 3, 24)).astype(jnp.float32)
        st = hf.init_state(params, 1.0)
        p, s, m = jax.jit(lambda p_, s_: hf.hf_step(
            p_, s_, x, jax.random.PRNGKey(2), cg_iters=8))(params, st)
        profiling.force(m["loss"])
        assert bool(jnp.isfinite(m["loss"]))

    def hf_shard_map():
        # HF under the EXPLICIT shard_map style on the chip (1-device mesh:
        # exercises the pmean'd-CG lowering + manual-mode Pallas legality on
        # real hardware; multi-device equality is tested on the CPU mesh)
        from multinn_tpu.data.datasets import DataConfig
        from multinn_tpu.parallel.mesh import MeshConfig
        from multinn_tpu.training.trainer import Trainer
        from multinn_tpu.utils import config as cfg_mod
        import numpy as np
        import tempfile
        with tempfile.TemporaryDirectory() as tmp:
            cfg = cfg_mod.ExperimentConfig(
                name="smoke_hf_sm",
                data=DataConfig.from_preset("synthetic", n_tracks=3,
                                            pitch_min=40, pitch_max=63,
                                            synthetic_songs=4,
                                            synthetic_steps=32, window=16,
                                            batch_size=4),
                model=MultINNConfig(n_tracks=3, n_pitches=24,
                                    mode="feedback",
                                    decoder_type="rnn-nade",
                                    n_hidden=32, n_rnn=16),
                train=cfg_mod.TrainConfig(epochs=1, ckpt_every_steps=0,
                                          optimizer="hf", hf_cg_iters=6,
                                          run_dir=tmp),
                mesh=MeshConfig(use_mesh=True, data=1, style="shard_map"),
            ).validate()
            t = Trainer(cfg)
            t.train_epoch()
            ev = t.evaluate("valid")
            assert np.isfinite(ev["loss"])
            t.close()

    check("pallas_gibbs_chain", gibbs_kernel)
    check("pallas_nade_sweep", nade_kernel)
    check("pallas_nade_ll_train_kernel_fwd_bwd", nade_ll_kernel)
    check("fused_gen_rbm_feedback", fused("rnn-rbm", "feedback"))
    check("fused_gen_rbm_per_track", fused("rnn-rbm", "per-track"))
    check("fused_gen_nade_feedback", fused("rnn-nade", "feedback"))
    check("fused_gen_rbm_batched_b8", fused("rnn-rbm", "feedback", batch=8))
    check("fused_gen_nade_batched_b8", fused("rnn-nade", "feedback",
                                             batch=8))
    check("fused_gen_rbm_joint", fused("rnn-rbm", "joint"))
    check("fused_gen_nade_joint", fused("rnn-nade", "joint"))
    check("fused_gen_nade_2layer", fused_multilayer)
    check("fused_gen_rbm_b128_bf16_capacity",
          fused("rnn-rbm", "feedback", batch=128))
    check("fused_gen_nade_dbn_encoder",
          fused("rnn-nade", "feedback", encoder_hidden=(64,)))
    check("fused_gen_rbm_vanilla_cell",
          fused("rnn-rbm", "feedback", cell="vanilla"))
    check("fused_gen_nade_b64_bf16_capacity",
          fused("rnn-nade", "feedback", batch=64))
    check("fused_accompaniment_passthrough", accomp(fused=True))
    check("scan_accompaniment_where_merge", accomp(fused=False,
                                                   subset=False))
    check("hessian_free_macro_step", hf_step)
    check("hessian_free_shard_map_style", hf_shard_map)
    check("train_multistep_and_masked_eval", train_multi)

    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        return 1
    print("\nALL TPU SMOKE CHECKS PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
