"""Regenerate the golden fixed-seed artifacts (SURVEY §4.2).

Run from the repo root when the RNG contract or model math INTENTIONALLY
changes (the accompanying test failing otherwise is the point):

    python tests/golden_gen.py

``build()`` is split per artifact group so the test fixtures compile only
what the selected tier needs (the HF macro-step pin's CG-loop program is
the single heaviest compile and its test is slow-tier — r5 fast-tier
re-budget).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the same backend/config the tests use
import tests.conftest  # noqa: F401,E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build_core():
    """Loss + bit-exact sampled roll pins for both decoder families."""
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


def build_hf():
    """Flagship-surface pin (VERDICT r3 #6): HF macro-step metrics tuple on
    the feedback RNN-NADE composition."""
    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig
    from multinn_tpu.training import hf

    cfg_hf = MultINNConfig(n_tracks=2, n_pitches=16, mode="feedback",
                           decoder_type="rnn-nade", n_hidden=8, n_rnn=6,
                           w_std=0.1)
    p_hf = multinn.init(jax.random.PRNGKey(1234), cfg_hf)
    x = jax.random.bernoulli(
        jax.random.PRNGKey(5678), 0.3, (2, 6, 2, 16)).astype(jnp.float32)
    _, hst, met = hf.hf_step(p_hf, hf.init_state(p_hf), x,
                             jax.random.PRNGKey(99), cg_iters=6)
    return {"hf_macro_metrics": np.asarray(
        [met["loss"], met["hf_rho"], met["hf_lambda"], met["hf_q"],
         met["hf_accepted"], met["grad_norm"]], dtype=np.float64)}


def build_dbn():
    """DBN-encoder feedback composition (latent-space loss + roll)."""
    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig

    cfg_dbn = MultINNConfig(n_tracks=2, n_pitches=16, mode="feedback",
                            decoder_type="rnn-rbm", encoder_hidden=(8,),
                            n_hidden=8, n_rnn=6, cd_k=1, gen_k=2, w_std=0.1)
    p_dbn = multinn.init(jax.random.PRNGKey(1234), cfg_dbn)
    x = jax.random.bernoulli(
        jax.random.PRNGKey(5678), 0.3, (2, 6, 2, 16)).astype(jnp.float32)
    loss_dbn, _ = multinn.loss(p_dbn, jax.random.PRNGKey(99), x)
    st = multinn.prime(p_dbn, multinn.init_state(p_dbn, 2), x)
    _, roll_dbn = multinn.generate(p_dbn, jax.random.PRNGKey(777), st, 8)
    return {"dbn_loss": np.asarray(loss_dbn),
            "dbn_roll": np.asarray(roll_dbn).astype(np.uint8)}


def build_accomp():
    """Accompaniment (track-conditional generation, scan path): pins the
    per-track key construction + subset-sampling RNG contract across
    commits (given track 0 passes through; track 1 is sampled conditioned
    on it through the feedback ctx)."""
    from multinn_tpu.models import multinn
    from multinn_tpu.models.multinn import MultINNConfig

    cfg_ac = MultINNConfig(n_tracks=2, n_pitches=16, mode="feedback",
                           decoder_type="rnn-nade", n_hidden=8, n_rnn=6,
                           w_std=0.1)
    p_ac = multinn.init(jax.random.PRNGKey(1234), cfg_ac)
    giv = jax.random.bernoulli(
        jax.random.PRNGKey(4321), 0.3, (2, 8, 2, 16)).astype(jnp.float32)
    _, roll_ac = multinn.generate_accompaniment(
        p_ac, jax.random.PRNGKey(777), multinn.init_state(p_ac, 2),
        giv, (0,), fused=False)
    return {"accomp_roll": np.asarray(roll_ac).astype(np.uint8)}


def build():
    out = build_core()
    out.update(build_hf())
    out.update(build_dbn())
    out.update(build_accomp())
    return out


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "golden", "golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arts = build()
    np.savez_compressed(path, **arts)
    print("wrote", path)
    for k, v in arts.items():
        print(k, getattr(v, "shape", v))
