"""A/B the NADE exact-LL training step: XLA exclusive-cumsum forms vs the
grid-free Pallas kernel (ops/nade_ll_pallas.py) on the live chip.

Measures the flagship 5-track feedback RNN-NADE optimizer step in-program
(lax.scan of n_iter steps, value-fetch sync — BASELINE.md measurement notes)
at several batch sizes. Run: python scripts/nade_train_ab.py [--iters N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batches", type=int, nargs="*", default=[16, 64, 256])
    ap.add_argument("--hidden", type=int, default=150)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig
    from multinn_tpu.utils.platform import enable_compilation_cache
    from multinn_tpu.utils.profiling import force

    enable_compilation_cache()
    cfg = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                        decoder_type="rnn-nade", n_hidden=args.hidden,
                        n_rnn=100)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    T = 64

    def make_many(impl, n_iter):
        os.environ["MULTINN_NADE_LL_IMPL"] = impl

        @jax.jit
        def train_many(p, s, key, xb):
            def body(carry, kk):
                p, s = carry
                (l, _), g = jax.value_and_grad(
                    lambda q: multinn.loss(q, kk, xb, detailed=False),
                    has_aux=True)(p)
                u, s = opt.update(g, s)
                return (optax.apply_updates(p, u), s), l
            (p, s), ls = jax.lax.scan(body, (p, s),
                                      jax.random.split(key, n_iter))
            return p, s, ls[-1]
        return train_many

    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    for b in args.batches:
        x = jax.device_put(jax.random.bernoulli(
            jax.random.PRNGKey(1), 0.06,
            (b, T, cfg.n_tracks, cfg.n_pitches)).astype(jnp.float32))
        row = {}
        for impl in ("xla", "pallas"):
            fn = make_many(impl, args.iters)
            s = opt.init(params)
            p = params
            k = jax.random.PRNGKey(2)
            t0 = time.time()
            for i in range(3):
                p, s, loss = fn(p, s, jax.random.fold_in(k, i), x)
            force(loss)
            warm = time.time() - t0
            times = []
            for i in range(3, 6):
                t0 = time.time()
                p, s, loss = fn(p, s, jax.random.fold_in(k, i), x)
                force(loss)
                times.append(time.time() - t0)
            step_ms = min(times) / args.iters * 1e3
            row[impl] = (step_ms, float(loss), warm)
            fps = b * T / (step_ms / 1e3)
            print(f"B={b:4d} {impl:6s}: {step_ms:7.2f} ms/step "
                  f"({fps/1e3:8.0f}k frames/s/chip)  loss={float(loss):.4f} "
                  f"[compile+warm {warm:.1f}s]")
        sp = row["xla"][0] / row["pallas"][0]
        dl = abs(row["xla"][1] - row["pallas"][1])
        print(f"B={b:4d} speedup: {sp:.2f}x   |loss delta|={dl:.2e}")
    os.environ.pop("MULTINN_NADE_LL_IMPL", None)


if __name__ == "__main__":
    main()
