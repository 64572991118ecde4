"""Regenerate the golden fixed-seed artifacts (SURVEY §4.2).

Run from the repo root when the RNG contract or model math INTENTIONALLY
changes (the accompanying test failing otherwise is the point):

    python tests/golden_gen.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the same backend/config the tests use
import tests.conftest  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build():
    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig

    out = {}
    for dec in ("rnn-rbm", "rnn-nade"):
        cfg = MultINNConfig(n_tracks=2, n_pitches=16, mode="feedback",
                            decoder_type=dec, n_hidden=8, n_rnn=6,
                            cd_k=1, gen_k=2, w_std=0.1)
        params = multinn.init(jax.random.PRNGKey(1234), cfg)
        x = jax.random.bernoulli(
            jax.random.PRNGKey(5678), 0.3, (2, 6, 2, 16)).astype(jnp.float32)
        loss, _ = multinn.loss(params, jax.random.PRNGKey(99), x)
        st = multinn.init_state(params, 2)
        st = multinn.prime(params, st, x)
        _, roll = multinn.generate(params, jax.random.PRNGKey(777), st, 8)
        tag = dec.replace("-", "_")
        out[f"{tag}_loss"] = np.asarray(loss)
        out[f"{tag}_roll"] = np.asarray(roll).astype(np.uint8)
    return out


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **build())
    print("wrote", path)
    for k, v in build().items():
        print(k, getattr(v, "shape", v))
