"""Whole-generation fused kernel (ops/gen_fused.py) vs the lax.scan path:
interpret-mode equivalence at the distribution level, state-contract parity,
and dispatch gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier: multi-device equality / interpret-mode kernels

from multinn_tpu.models import multinn
from multinn_tpu.models.multinn import MultINNConfig
from multinn_tpu.ops import gen_fused

K, D, H, U = 3, 16, 12, 10


def cfg_for(mode="feedback", **kw):
    base = dict(n_tracks=K, n_pitches=D, mode=mode, decoder_type="rnn-rbm",
                n_hidden=H, n_rnn=U, cd_k=1, gen_k=3, w_std=0.2)
    base.update(kw)
    return MultINNConfig(**base)


@pytest.mark.parametrize("mode", ["feedback", "per-track"])
def test_fused_matches_scan_distribution(mode):
    """Same trained params, same seed count: fused and scan paths must agree
    in shape/binarity and in mean activation (different RNG streams, same
    distribution — strong-bias regions must agree tightly)."""
    cfg = cfg_for(mode)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    # push biases so the marginal distribution has structure
    dec = params.decoder
    bv = dec.bv + jnp.linspace(-2.0, 2.0, D)[None, :]
    params = params.replace(decoder=dec.replace(bv=bv))

    st = multinn.init_state(params, 1)
    T = 64
    _, scan_roll = multinn.generate(params, jax.random.PRNGKey(1), st, T,
                                    fused=False)
    st2 = multinn.init_state(params, 1)
    fin, fused_roll = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st2, T, interpret=True)
    assert fused_roll.shape == scan_roll.shape == (1, T, K, D)
    assert set(np.unique(np.asarray(fused_roll))) <= {0.0, 1.0}
    # per-dim mean activation across time must match between impls
    m_scan = np.asarray(scan_roll.mean(axis=(0, 1, 2)))
    m_fused = np.asarray(fused_roll.mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(m_fused, m_scan, atol=0.12)
    # state contract: final v_prev equals last emitted frame
    np.testing.assert_array_equal(
        np.asarray(fin.decoder.v_prev[:, 0, :]),
        np.asarray(fused_roll[0, -1]))
    if mode == "feedback":
        assert fin.ctx.shape == (1, K * D)


def test_fused_determinism_and_seed_sensitivity():
    cfg = cfg_for()
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    st = multinn.init_state(params, 1)
    _, r1 = multinn._generate_fused(params, jax.random.PRNGKey(7), st, 8,
                                    interpret=True)
    _, r2 = multinn._generate_fused(params, jax.random.PRNGKey(7), st, 8,
                                    interpret=True)
    _, r3 = multinn._generate_fused(params, jax.random.PRNGKey(8), st, 8,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert not np.array_equal(np.asarray(r1), np.asarray(r3))


def test_fused_priming_carries_state():
    """Priming on opposite seeds must change the fused continuation."""
    cfg = cfg_for()
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    seed_a = jnp.zeros((1, 6, K, D)).at[:, :, :, ::2].set(1.0)
    seed_b = 1.0 - seed_a
    st_a = multinn.prime(params, multinn.init_state(params, 1), seed_a)
    st_b = multinn.prime(params, multinn.init_state(params, 1), seed_b)
    _, ra = multinn._generate_fused(params, jax.random.PRNGKey(1), st_a, 8,
                                    interpret=True)
    _, rb = multinn._generate_fused(params, jax.random.PRNGKey(1), st_b, 8,
                                    interpret=True)
    assert not np.array_equal(np.asarray(ra), np.asarray(rb))


@pytest.mark.parametrize("mode", ["feedback", "per-track"])
def test_fused_batched_matches_scan_distribution(mode):
    """Batched fused generation (B=4): same distribution as the scan path,
    per-sample binarity, and the state contract at every batch row."""
    cfg = cfg_for(mode)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    bv = dec.bv + jnp.linspace(-2.0, 2.0, D)[None, :]
    params = params.replace(decoder=dec.replace(bv=bv))

    B, T = 4, 48
    st = multinn.init_state(params, B)
    _, scan_roll = multinn.generate(params, jax.random.PRNGKey(1), st, T,
                                    fused=False)
    st2 = multinn.init_state(params, B)
    fin, fused_roll = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st2, T, interpret=True)
    assert fused_roll.shape == scan_roll.shape == (B, T, K, D)
    assert set(np.unique(np.asarray(fused_roll))) <= {0.0, 1.0}
    m_scan = np.asarray(scan_roll.mean(axis=(0, 1, 2)))
    m_fused = np.asarray(fused_roll.mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(m_fused, m_scan, atol=0.12)
    # state contract: v_prev (K, B, D) equals each sample's last frame
    np.testing.assert_array_equal(
        np.asarray(jnp.moveaxis(fin.decoder.v_prev, 0, 1)),
        np.asarray(fused_roll[:, -1]))
    if mode == "feedback":
        assert fin.ctx.shape == (B, K * D)
    # batch rows are independent samples, not copies
    assert not np.array_equal(np.asarray(fused_roll[0]),
                              np.asarray(fused_roll[1]))


def test_fused_batched_deterministic_bias_pattern():
    """With all stochastic couplings zeroed and strong biases, every batch
    row must deterministically reproduce the bias pattern — verifies the
    batched row layout has no cross-sample mixing."""
    cfg = cfg_for("feedback", w_std=0.0)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    pattern = jnp.where(jnp.arange(D) % 3 == 0, 10.0, -10.0)
    bv = jnp.tile(pattern[None], (K, 1))
    bv = bv.at[1].set(-pattern)          # track 1 complementary
    params = params.replace(decoder=dec.replace(
        bv=bv, w=jnp.zeros_like(dec.w), wuv=jnp.zeros_like(dec.wuv),
        wuh=jnp.zeros_like(dec.wuh)))
    B = 5
    st = multinn.init_state(params, B)
    _, roll = multinn._generate_fused(params, jax.random.PRNGKey(3), st, 4,
                                      interpret=True)
    expect0 = (np.asarray(pattern) > 0).astype(np.float32)
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(roll[b, :, 0]),
                                      np.tile(expect0, (4, 1)))
        np.testing.assert_array_equal(np.asarray(roll[b, :, 1]),
                                      np.tile(1 - expect0, (4, 1)))


# ---------------------------------------------------------------------------
# NADE whole-generation kernel
# ---------------------------------------------------------------------------

def nade_cfg(mode="feedback", **kw):
    base = dict(n_tracks=K, n_pitches=D, mode=mode, decoder_type="rnn-nade",
                n_hidden=H, n_rnn=U, w_std=0.2)
    base.update(kw)
    return MultINNConfig(**base)


@pytest.mark.parametrize("mode", ["feedback", "per-track"])
def test_nade_fused_matches_scan_distribution(mode):
    cfg = nade_cfg(mode)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    bv = dec.bv + jnp.linspace(-2.0, 2.0, D)[None, :]
    params = params.replace(decoder=dec.replace(bv=bv))

    st = multinn.init_state(params, 1)
    T = 64
    _, scan_roll = multinn.generate(params, jax.random.PRNGKey(1), st, T,
                                    fused=False)
    st2 = multinn.init_state(params, 1)
    fin, fused_roll = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st2, T, interpret=True)
    assert fused_roll.shape == scan_roll.shape == (1, T, K, D)
    assert set(np.unique(np.asarray(fused_roll))) <= {0.0, 1.0}
    m_scan = np.asarray(scan_roll.mean(axis=(0, 1, 2)))
    m_fused = np.asarray(fused_roll.mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(m_fused, m_scan, atol=0.12)
    np.testing.assert_array_equal(
        np.asarray(fin.decoder.v_prev[:, 0, :]),
        np.asarray(fused_roll[0, -1]))


def test_nade_fused_exact_singlestep_conditionals():
    """Stronger check: with the RNN zeroed out and huge +/- visible biases,
    the NADE kernel must deterministically reproduce the bias pattern —
    verifies the dim-major block algebra (W', V', bv_dm) exactly."""
    cfg = nade_cfg("per-track", w_std=0.0)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    pattern = jnp.where(jnp.arange(D) % 3 == 0, 8.0, -8.0)
    bv = jnp.tile(pattern[None], (K, 1))
    # make track 1 the complement to catch track-block mixups
    bv = bv.at[1].set(-pattern)
    params = params.replace(decoder=dec.replace(bv=bv))
    st = multinn.init_state(params, 1)
    _, roll = multinn._generate_fused(params, jax.random.PRNGKey(3), st, 4,
                                      interpret=True)
    expect0 = (pattern > 0).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(roll[0, :, 0]),
                                  np.tile(expect0, (4, 1)))
    np.testing.assert_array_equal(np.asarray(roll[0, :, 1]),
                                  np.tile(1 - expect0, (4, 1)))


def test_nade_fused_feedback_coupling():
    """The z-accumulation must route other tracks' samples into each LSTM:
    zero W (no NADE deps), huge ctx weights from track 0 -> the kernel must
    not crash and outputs stay binary (coupling smoke at algebra level)."""
    cfg = nade_cfg("feedback")
    params = multinn.init(jax.random.PRNGKey(4), cfg)
    st = multinn.init_state(params, 1)
    _, r = multinn._generate_fused(params, jax.random.PRNGKey(5), st, 6,
                                   interpret=True)
    assert set(np.unique(np.asarray(r))) <= {0.0, 1.0}


def test_nade_fused_batched_matches_scan_distribution():
    """Batched NADE fused generation (B=8): distribution parity vs scan,
    state contract per batch row, per-row independence."""
    cfg = nade_cfg("feedback")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    bv = dec.bv + jnp.linspace(-2.0, 2.0, D)[None, :]
    params = params.replace(decoder=dec.replace(bv=bv))

    B, T = 8, 32
    st = multinn.init_state(params, B)
    _, scan_roll = multinn.generate(params, jax.random.PRNGKey(1), st, T,
                                    fused=False)
    st2 = multinn.init_state(params, B)
    fin, fused_roll = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st2, T, interpret=True)
    assert fused_roll.shape == scan_roll.shape == (B, T, K, D)
    assert set(np.unique(np.asarray(fused_roll))) <= {0.0, 1.0}
    m_scan = np.asarray(scan_roll.mean(axis=(0, 1, 2)))
    m_fused = np.asarray(fused_roll.mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(m_fused, m_scan, atol=0.12)
    np.testing.assert_array_equal(
        np.asarray(jnp.moveaxis(fin.decoder.v_prev, 0, 1)),
        np.asarray(fused_roll[:, -1]))
    assert fin.ctx.shape == (B, K * D)
    assert not np.array_equal(np.asarray(fused_roll[0]),
                              np.asarray(fused_roll[1]))


def test_nade_fused_batched_deterministic_bias_pattern():
    """Strong-bias determinism at B=8: every batch row reproduces its
    track's bias pattern — no cross-sample or cross-track mixing in the
    batched dim-major layout."""
    cfg = nade_cfg("per-track", w_std=0.0)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    pattern = jnp.where(jnp.arange(D) % 3 == 0, 10.0, -10.0)
    bv = jnp.tile(pattern[None], (K, 1)).at[1].set(-pattern)
    params = params.replace(decoder=dec.replace(bv=bv))
    B = 8
    st = multinn.init_state(params, B)
    _, roll = multinn._generate_fused(params, jax.random.PRNGKey(3), st, 3,
                                      interpret=True)
    expect0 = (np.asarray(pattern) > 0).astype(np.float32)
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(roll[b, :, 0]),
                                      np.tile(expect0, (3, 1)))
        np.testing.assert_array_equal(np.asarray(roll[b, :, 1]),
                                      np.tile(1 - expect0, (3, 1)))


# ---------------------------------------------------------------------------
# feedback-context timing parity (regression: fused kernels must condition
# the LSTM on ctx(t) = latents(t-1), exactly like training and the scan path)
# ---------------------------------------------------------------------------

def _deterministic_params(cfg, bv_pattern):
    """Zero all stochastic couplings so sampling is deterministic
    (v(t) = [bv_pattern > 0] for every step) while the LSTM still sees the
    samples + feedback context."""
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    zeros = {f: jnp.zeros_like(getattr(dec, f)) for f in ("w", "wuv", "wuh")}
    if hasattr(dec, "v"):
        zeros["v"] = jnp.zeros_like(dec.v)
    bv = jnp.tile(bv_pattern[None], (cfg.n_tracks, 1))
    return params.replace(decoder=dec.replace(bv=bv, **zeros))


@pytest.mark.parametrize("dec_type", ["rnn-rbm", "rnn-nade"])
def test_fused_feedback_ctx_timing_matches_scan(dec_type):
    """Prime on a seed frame DIFFERENT from the (deterministic) generated
    frame: at t=0 the LSTM's feedback context must be the primed latents,
    not the just-sampled frame — final LSTM states of fused and scan paths
    must agree exactly."""
    cfg = MultINNConfig(n_tracks=K, n_pitches=D, mode="feedback",
                        decoder_type=dec_type, n_hidden=H, n_rnn=U,
                        cd_k=1, gen_k=2, w_std=0.3)
    pattern = jnp.where(jnp.arange(D) % 2 == 0, 10.0, -10.0)
    params = _deterministic_params(cfg, pattern)

    seed = jnp.zeros((1, 4, K, D))
    seed = seed.at[:, :, :, 1::2].set(1.0)   # opposite of the sampled frame

    st_scan = multinn.prime(params, multinn.init_state(params, 1), seed)
    fin_scan, roll_scan = multinn.generate(
        params, jax.random.PRNGKey(1), st_scan, 3, fused=False)

    st_fused = multinn.prime(params, multinn.init_state(params, 1), seed)
    fin_fused, roll_fused = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st_fused, 3, interpret=True)

    # deterministic sampling: pianorolls identical across paths
    np.testing.assert_array_equal(np.asarray(roll_scan),
                                  np.asarray(roll_fused))
    # LSTM trajectories identical => context timing identical. The NADE
    # kernel stores its input-projection block matrices in bf16 (VMEM
    # budget), so its states carry ~1e-3 rounding; a WRONG-timing context
    # (the bug this guards against) produces O(1) differences.
    tol = dict(rtol=1e-5, atol=1e-6) if dec_type == "rnn-rbm" else \
        dict(rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(fin_fused.decoder.cell[0].h),
        np.asarray(fin_scan.decoder.cell[0].h), **tol)
    np.testing.assert_allclose(
        np.asarray(fin_fused.decoder.cell[0].c),
        np.asarray(fin_scan.decoder.cell[0].c), **tol)


@pytest.mark.parametrize("spec", [2, 4])
@pytest.mark.parametrize("mode,batch", [("per-track", 1), ("feedback", 1),
                                        ("feedback", 8)])
def test_nade_spec_identical_to_sequential(mode, batch, spec):
    """The speculative dim sweeps (gen_fused spec — VERDICT r2 next #6)
    must reproduce the sequential sweep: they consume the same uniforms and
    per track select between exactly-computed branch activations (spec=2:
    both branches; spec=4: realized-path-order adds from single-dim w
    rows), so any sample deviation is a bug, not sampling noise. Covers
    roll AND final LSTM state, per-track + feedback wiring, B=1 (VPU
    logits) and B=8 (stacked MXU logits). spec=2 is bit-identical by
    construction; spec=4's cross-quad acc grouping can differ from the
    sequential sweep in the last ulp, so its states get a float-tolerance
    (a timing/selection bug would produce O(1) differences — same guard
    structure as the scan-parity test above)."""
    from multinn_tpu.ops import gen_fused
    k_tr, d_p, u_r = 3, 8, 4
    cfg = multinn.MultINNConfig(n_tracks=k_tr, n_pitches=d_p, mode=mode,
                                decoder_type="rnn-nade", n_hidden=5,
                                n_rnn=u_r, w_std=0.7)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    h0 = jnp.zeros((k_tr, batch, u_r))
    c0 = jnp.zeros((k_tr, batch, u_r))
    v0 = jnp.zeros((k_tr, batch, d_p))
    key = jax.random.PRNGKey(5)
    r_seq = gen_fused.generate_nade(key, dec, h0, c0, v0, 16,
                                    interpret=True, spec=1)
    r_sp = gen_fused.generate_nade(key, dec, h0, c0, v0, 16,
                                   interpret=True, spec=spec)
    np.testing.assert_array_equal(np.asarray(r_seq[0]), np.asarray(r_sp[0]))
    for a, b in zip(r_seq[1:], r_sp[1:]):
        if spec == 2:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
    assert float(r_sp[0].mean()) > 0.05      # non-degenerate sampling


@pytest.mark.parametrize("dec_type", ["rnn-rbm", "rnn-nade"])
def test_joint_mode_fused_matches_scan_distribution(dec_type):
    """Joint mode enters the kernels as ONE track of width K*D
    (gen_fused._eff_dims): the fused path must agree with the scan path in
    distribution, honor the (B, T, K, D) roll contract, and return a
    joint-shaped (unstacked) state."""
    cfg = MultINNConfig(n_tracks=3, n_pitches=16, mode="joint",
                        decoder_type=dec_type, n_hidden=12, n_rnn=10,
                        cd_k=1, gen_k=3, w_std=0.2)
    assert (gen_fused.supported(cfg, 1) if dec_type == "rnn-rbm"
            else gen_fused.supported_nade(cfg, 1))
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    bv = dec.bv + jnp.linspace(-2.0, 2.0, 3 * 16)
    params = params.replace(decoder=dec.replace(bv=bv))

    # T sized for the tolerance: the time-mean of correlated Gibbs samples
    # has measured scan-vs-scan noise ~0.10-0.15 at T=48; T=96 halves the
    # variance (noise floor ~0.09 measured across seeds)
    T = 96
    st = multinn.init_state(params, 1)
    _, scan_roll = multinn.generate(params, jax.random.PRNGKey(1), st, T,
                                    fused=False)
    st2 = multinn.init_state(params, 1)
    fin, fused_roll = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st2, T, interpret=True)
    assert fused_roll.shape == scan_roll.shape == (1, T, 3, 16)
    assert set(np.unique(np.asarray(fused_roll))) <= {0.0, 1.0}
    m_scan = np.asarray(scan_roll.mean(axis=(0, 1, 2)))
    m_fused = np.asarray(fused_roll.mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(m_fused, m_scan, atol=0.13)
    # unstacked state contract: v_prev (B, K*D) equals the last frame
    assert fin.decoder.v_prev.shape == (1, 3 * 16)
    np.testing.assert_array_equal(
        np.asarray(fin.decoder.v_prev[0]),
        np.asarray(fused_roll[0, -1].reshape(-1)))
    assert fin.decoder.cell[0].h.shape == (1, 10)
    assert fin.ctx is None
    # fused continuation from the returned state must keep working
    _, roll2 = multinn._generate_fused(params, jax.random.PRNGKey(3), fin, 4,
                                       interpret=True)
    assert roll2.shape == (1, 4, 3, 16)


@pytest.mark.parametrize("dec_type", ["rnn-rbm", "rnn-nade"])
def test_multilayer_fused_matches_scan_distribution(dec_type):
    """Stacked (2-layer) LSTM cells in the whole-generation kernels: layer
    l consumes layer l-1's fresh h; bias conditioning reads the TOP layer
    (scan-path parity). Distribution + full stacked-state contract."""
    cfg = MultINNConfig(n_tracks=3, n_pitches=16, mode="feedback",
                        decoder_type=dec_type, n_hidden=12, n_rnn=10,
                        rnn_layers=2, cd_k=1, gen_k=3, w_std=0.2)
    assert (gen_fused.supported(cfg, 1) if dec_type == "rnn-rbm"
            else gen_fused.supported_nade(cfg, 1))
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    bv = dec.bv + jnp.linspace(-2.0, 2.0, 16)[None, :]
    params = params.replace(decoder=dec.replace(bv=bv))

    T = 96
    st = multinn.init_state(params, 1)
    _, scan_roll = multinn.generate(params, jax.random.PRNGKey(1), st, T,
                                    fused=False)
    st2 = multinn.init_state(params, 1)
    fin, fused_roll = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st2, T, interpret=True)
    assert fused_roll.shape == scan_roll.shape == (1, T, 3, 16)
    m_scan = np.asarray(scan_roll.mean(axis=(0, 1, 2)))
    m_fused = np.asarray(fused_roll.mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(m_fused, m_scan, atol=0.13)
    # stacked-state contract: 2 layers, each (K, B, U); priming then fused
    # continuation must roundtrip through the scan-path state structure
    assert len(fin.decoder.cell) == 2
    for lstate in fin.decoder.cell:
        assert lstate.h.shape == (3, 1, 10)
    np.testing.assert_array_equal(
        np.asarray(jnp.moveaxis(fin.decoder.v_prev, 0, 1)),
        np.asarray(fused_roll[:, -1]))
    st3 = multinn.prime(params, multinn.init_state(params, 1),
                        fused_roll[:, :8])
    _, roll2 = multinn._generate_fused(params, jax.random.PRNGKey(3), st3,
                                       4, interpret=True)
    assert roll2.shape == (1, 4, 3, 16)


def test_multilayer_fused_state_equals_scan_trajectory():
    """Deterministic check that the stacked-layer plumbing is EXACT: with
    w_std=0 and strong biases the samples are deterministic, so the fused
    kernel's final 2-layer LSTM states must match the scan path's to float
    tolerance (wrong layer wiring produces O(1) differences)."""
    cfg = MultINNConfig(n_tracks=2, n_pitches=8, mode="feedback",
                        decoder_type="rnn-rbm", n_hidden=6, n_rnn=5,
                        rnn_layers=2, cd_k=1, gen_k=2, w_std=0.0)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    pattern = jnp.where(jnp.arange(8) % 2 == 0, 10.0, -10.0)
    params = params.replace(decoder=dec.replace(
        bv=jnp.tile(pattern[None], (2, 1))))
    # give the LSTM stack real weights (only the RBM couplings stay zero so
    # sampling is deterministic)
    import dataclasses
    cells = []
    kk = jax.random.PRNGKey(7)
    for i, c in enumerate(params.decoder.cell):
        k1, k2, kk = jax.random.split(kk, 3)
        cells.append(c.replace(
            wx=0.4 * jax.random.normal(k1, c.wx.shape),
            wh=0.4 * jax.random.normal(k2, c.wh.shape)))
    params = params.replace(decoder=params.decoder.replace(
        cell=tuple(cells)))
    T = 6
    st = multinn.init_state(params, 1)
    fin_s, roll_s = multinn.generate(params, jax.random.PRNGKey(1), st, T,
                                     fused=False)
    st2 = multinn.init_state(params, 1)
    fin_f, roll_f = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st2, T, interpret=True)
    np.testing.assert_array_equal(np.asarray(roll_f), np.asarray(roll_s))
    for ls, lf in zip(fin_s.decoder.cell, fin_f.decoder.cell):
        np.testing.assert_allclose(np.asarray(lf.h), np.asarray(ls.h),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lf.c), np.asarray(ls.c),
                                   rtol=1e-5, atol=1e-6)


def test_rbm_bf16_capacity_mode_matches_f32_distribution():
    """Forced bf16 weight storage must sample the same distribution as f32
    (weights round at ~1e-3 relative — far inside the sampling noise) and
    reproduce the deterministic-bias pattern EXACTLY (biases stay f32)."""
    cfg = cfg_for("feedback")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    bv = dec.bv + jnp.linspace(-2.0, 2.0, D)[None, :]
    params = params.replace(decoder=dec.replace(bv=bv))
    T = 96
    h0 = jnp.zeros((K, 1, U)); c0 = jnp.zeros((K, 1, U))
    v0 = jnp.zeros((K, 1, D))
    r32 = gen_fused.generate_rbm(jax.random.PRNGKey(1), params.decoder,
                                 h0, c0, v0, T, 3, interpret=True,
                                 wdtype=jnp.float32)
    r16 = gen_fused.generate_rbm(jax.random.PRNGKey(2), params.decoder,
                                 h0, c0, v0, T, 3, interpret=True,
                                 wdtype=jnp.bfloat16)
    m32 = np.asarray(r32[0].mean(axis=(0, 1, 2)))
    m16 = np.asarray(r16[0].mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(m16, m32, atol=0.13)
    # zero-coupling determinism: bf16 rounding of ZERO weights is exact, so
    # the strong-bias pattern must be bit-identical between storage modes
    cfg0 = cfg_for("feedback", w_std=0.0)
    p0 = multinn.init(jax.random.PRNGKey(0), cfg0)
    pattern = jnp.where(jnp.arange(D) % 3 == 0, 10.0, -10.0)
    p0 = p0.replace(decoder=p0.decoder.replace(
        bv=jnp.tile(pattern[None], (K, 1)), w=jnp.zeros_like(p0.decoder.w),
        wuv=jnp.zeros_like(p0.decoder.wuv),
        wuh=jnp.zeros_like(p0.decoder.wuh)))
    a = gen_fused.generate_rbm(jax.random.PRNGKey(3), p0.decoder, h0, c0,
                               v0, 4, 2, interpret=True,
                               wdtype=jnp.float32)
    b = gen_fused.generate_rbm(jax.random.PRNGKey(3), p0.decoder, h0, c0,
                               v0, 4, 2, interpret=True,
                               wdtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


@pytest.mark.parametrize("mode,dec_type", [("feedback", "rnn-rbm"),
                                           ("per-track", "rnn-nade")])
def test_dbn_encoder_fused_matches_scan_distribution(mode, dec_type):
    """DBN encoders run fused too: the kernel generates LATENT frames
    (decoder dims = feature_dim, feedback ctx = latents) and the dispatch
    decodes the latent roll to pianoroll in one XLA pass (scan-path
    sample_step parity: SAMPLING the decode conditional p(v|h) —
    multinn._decode_sample). State stays in latent space — a fused
    continuation must keep working from it."""
    cfg = MultINNConfig(n_tracks=K, n_pitches=D, mode=mode,
                        decoder_type=dec_type, encoder_hidden=(8,),
                        n_hidden=H, n_rnn=U, cd_k=1, gen_k=3, w_std=0.4)
    assert (gen_fused.supported(cfg, 1) if dec_type == "rnn-rbm"
            else gen_fused.supported_nade(cfg, 1))
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    T = 96
    st = multinn.init_state(params, 1)
    _, scan_roll = multinn.generate(params, jax.random.PRNGKey(1), st, T,
                                    fused=False)
    st2 = multinn.init_state(params, 1)
    fin, fused_roll = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st2, T, interpret=True)
    assert fused_roll.shape == scan_roll.shape == (1, T, K, D)
    assert set(np.unique(np.asarray(fused_roll))) <= {0.0, 1.0}
    m_scan = np.asarray(scan_roll.mean(axis=(0, 1, 2)))
    m_fused = np.asarray(fused_roll.mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(m_fused, m_scan, atol=0.13)
    # state contract: v_prev lives in LATENT space (feature_dim)
    assert fin.decoder.v_prev.shape == (K, 1, 8)
    if mode == "feedback":
        assert fin.ctx.shape == (1, K * 8)
    _, roll2 = multinn._generate_fused(params, jax.random.PRNGKey(3), fin,
                                       4, interpret=True)
    assert roll2.shape == (1, 4, K, D)


def test_dbn_encoder_fused_joint_decodes():
    cfg = MultINNConfig(n_tracks=K, n_pitches=D, mode="joint",
                        decoder_type="rnn-rbm", encoder_hidden=(8,),
                        n_hidden=H, n_rnn=U, cd_k=1, gen_k=2, w_std=0.3)
    assert gen_fused.supported(cfg, 1)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    st = multinn.init_state(params, 1)
    fin, roll = multinn._generate_fused(params, jax.random.PRNGKey(1), st,
                                        8, interpret=True)
    assert roll.shape == (1, 8, K, D)
    assert set(np.unique(np.asarray(roll))) <= {0.0, 1.0}
    assert fin.decoder.v_prev.shape == (1, 8)     # joint latent space


@pytest.mark.parametrize("dec_type", ["rnn-rbm", "rnn-nade"])
def test_vanilla_cell_fused_matches_scan_distribution(dec_type):
    """The paper's vanilla tanh RNN runs in-kernel too (gate width g = U,
    h-only state): fused vs scan distribution parity plus the
    VanillaRNNState contract (no c leaf) and a working continuation."""
    cfg = MultINNConfig(n_tracks=K, n_pitches=D, mode="feedback",
                        decoder_type=dec_type, cell="vanilla",
                        n_hidden=H, n_rnn=U, cd_k=1, gen_k=3, w_std=0.3)
    assert (gen_fused.supported(cfg, 1) if dec_type == "rnn-rbm"
            else gen_fused.supported_nade(cfg, 1))
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    bv = dec.bv + jnp.linspace(-2.0, 2.0, D)[None, :]
    params = params.replace(decoder=dec.replace(bv=bv))
    T = 96
    st = multinn.init_state(params, 1)
    _, scan_roll = multinn.generate(params, jax.random.PRNGKey(1), st, T,
                                    fused=False)
    st2 = multinn.init_state(params, 1)
    fin, fused_roll = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st2, T, interpret=True)
    assert fused_roll.shape == scan_roll.shape == (1, T, K, D)
    m_scan = np.asarray(scan_roll.mean(axis=(0, 1, 2)))
    m_fused = np.asarray(fused_roll.mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(m_fused, m_scan, atol=0.13)
    from multinn_tpu.nn import rnn as rnn_nn
    assert isinstance(fin.decoder.cell[0], rnn_nn.VanillaRNNState)
    assert fin.decoder.cell[0].h.shape == (K, 1, U)
    _, roll2 = multinn._generate_fused(params, jax.random.PRNGKey(3), fin,
                                       4, interpret=True)
    assert roll2.shape == (1, 4, K, D)


def test_vanilla_cell_fused_state_equals_scan_trajectory():
    """Deterministic exactness of the vanilla-cell kernel wiring: zero RBM
    couplings + strong biases make sampling deterministic, so the fused
    final h trajectory must match the scan path to float tolerance."""
    cfg = MultINNConfig(n_tracks=2, n_pitches=8, mode="feedback",
                        decoder_type="rnn-rbm", cell="vanilla",
                        n_hidden=6, n_rnn=5, cd_k=1, gen_k=2, w_std=0.0)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    pattern = jnp.where(jnp.arange(8) % 2 == 0, 10.0, -10.0)
    params = params.replace(decoder=dec.replace(
        bv=jnp.tile(pattern[None], (2, 1))))
    cells = []
    kk = jax.random.PRNGKey(7)
    for c in params.decoder.cell:
        k1, k2, kk = jax.random.split(kk, 3)
        cells.append(c.replace(
            wx=0.4 * jax.random.normal(k1, c.wx.shape),
            wh=0.4 * jax.random.normal(k2, c.wh.shape)))
    params = params.replace(decoder=params.decoder.replace(
        cell=tuple(cells)))
    T = 6
    st = multinn.init_state(params, 1)
    fin_s, roll_s = multinn.generate(params, jax.random.PRNGKey(1), st, T,
                                     fused=False)
    st2 = multinn.init_state(params, 1)
    fin_f, roll_f = multinn._generate_fused(
        params, jax.random.PRNGKey(2), st2, T, interpret=True)
    np.testing.assert_array_equal(np.asarray(roll_f), np.asarray(roll_s))
    for ls, lf in zip(fin_s.decoder.cell, fin_f.decoder.cell):
        np.testing.assert_allclose(np.asarray(lf.h), np.asarray(ls.h),
                                   rtol=1e-5, atol=1e-6)


def test_nade_bf16_aux_capacity_mode_matches_f32_distribution():
    """Forced bf16 AUX storage (wuh/wh/stacked-wx — the capacity mode that
    admits B=64 serving) must sample the same distribution as f32 and, with
    all NADE couplings zeroed, reproduce the strong-bias pattern EXACTLY
    (the sampling then depends only on bv, which stays f32; bf16-rounded
    LSTM matrices feed nothing)."""
    cfg = MultINNConfig(n_tracks=K, n_pitches=D, mode="feedback",
                        decoder_type="rnn-nade", n_hidden=H, n_rnn=U,
                        w_std=0.3)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    dec = params.decoder
    bv = dec.bv + jnp.linspace(-2.0, 2.0, D)[None, :]
    params = params.replace(decoder=dec.replace(bv=bv))
    T = 96
    h0 = jnp.zeros((K, 1, U)); c0 = jnp.zeros((K, 1, U))
    v0 = jnp.zeros((K, 1, D))
    r32 = gen_fused.generate_nade(jax.random.PRNGKey(1), params.decoder,
                                  h0, c0, v0, T, interpret=True,
                                  aux_dtype=jnp.float32)
    r16 = gen_fused.generate_nade(jax.random.PRNGKey(2), params.decoder,
                                  h0, c0, v0, T, interpret=True,
                                  aux_dtype=jnp.bfloat16)
    m32 = np.asarray(r32[0].mean(axis=(0, 1, 2)))
    m16 = np.asarray(r16[0].mean(axis=(0, 1, 2)))
    np.testing.assert_allclose(m16, m32, atol=0.13)
    # zero-coupling determinism: same key, both storage modes -> identical
    cfg0 = MultINNConfig(n_tracks=K, n_pitches=D, mode="feedback",
                         decoder_type="rnn-nade", n_hidden=H, n_rnn=U,
                         w_std=0.0)
    p0 = multinn.init(jax.random.PRNGKey(0), cfg0)
    pattern = jnp.where(jnp.arange(D) % 3 == 0, 10.0, -10.0)
    p0 = p0.replace(decoder=p0.decoder.replace(
        bv=jnp.tile(pattern[None], (K, 1)),
        w=jnp.zeros_like(p0.decoder.w), v=jnp.zeros_like(p0.decoder.v),
        wuv=jnp.zeros_like(p0.decoder.wuv),
        wuh=jnp.zeros_like(p0.decoder.wuh)))
    a = gen_fused.generate_nade(jax.random.PRNGKey(3), p0.decoder, h0, c0,
                                v0, 4, interpret=True,
                                aux_dtype=jnp.float32)
    b = gen_fused.generate_nade(jax.random.PRNGKey(3), p0.decoder, h0, c0,
                                v0, 4, interpret=True,
                                aux_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_nade_gate_capacity_ladder():
    """The serving gate's dtype ladder at flagship size (VERDICT r3 #5):
    f32 through B=48, bf16 capacity mode at B=64, refusal past it."""
    from multinn_tpu.ops import gen_fused_nade
    cfg = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                        decoder_type="rnn-nade", n_hidden=150, n_rnn=100)
    assert gen_fused_nade.nade_aux_dtype(cfg, 48) == jnp.float32
    assert gen_fused_nade.nade_aux_dtype(cfg, 64) == jnp.bfloat16
    assert gen_fused_nade.nade_aux_dtype(cfg, 96) is None
    assert gen_fused.supported_nade(cfg, 64, 1024)

# ---- accompaniment (track-conditional) in the fused kernels ------------


def _stacked_state(params, b):
    st = multinn.init_state(params, b).decoder
    h0 = jnp.stack([s.h for s in st.cell])
    c0 = jnp.stack([s.c for s in st.cell])
    return h0, c0, st.v_prev


def test_rbm_accomp_self_conditioning_bit_exact():
    """Conditioning the RBM kernel on its OWN unconditional output must
    reproduce the unconditional run bit-for-bit (roll AND states): the
    block-diagonal layouts make within-frame chains track-independent, so
    the masked merge IS conditional sampling, and all cross-track coupling
    flows through the (identical) merged binary frame."""
    cfg = cfg_for("feedback")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    h0, c0, v0 = _stacked_state(params, 2)
    T, key = 16, jax.random.PRNGKey(5)
    ru, hu, cu = gen_fused.generate_rbm(key, params.decoder, h0, c0, v0,
                                        T, 3, interpret=True)
    rc, hc, cc = gen_fused.generate_rbm(key, params.decoder, h0, c0, v0,
                                        T, 3, interpret=True,
                                        given=ru, given_tracks=(0, 2))
    np.testing.assert_array_equal(np.asarray(ru), np.asarray(rc))
    np.testing.assert_array_equal(np.asarray(hu), np.asarray(hc))
    np.testing.assert_array_equal(np.asarray(cu), np.asarray(cc))


def test_rbm_accomp_accepts_list_given_tracks():
    """The public generate_rbm wrapper tuples given_tracks (lists are
    accepted, mirroring generate_nade) — a list must not hit the jitted
    implementation's static_argnames as an unhashable argument."""
    cfg = cfg_for("feedback")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    h0, c0, v0 = _stacked_state(params, 2)
    T, key = 4, jax.random.PRNGKey(5)
    ru = gen_fused.generate_rbm(key, params.decoder, h0, c0, v0,
                                T, 3, interpret=True)[0]
    rl = gen_fused.generate_rbm(key, params.decoder, h0, c0, v0,
                                T, 3, interpret=True,
                                given=ru, given_tracks=[0, 2])[0]
    rt = gen_fused.generate_rbm(key, params.decoder, h0, c0, v0,
                                T, 3, interpret=True,
                                given=ru, given_tracks=(0, 2))[0]
    np.testing.assert_array_equal(np.asarray(rl), np.asarray(rt))


def test_nade_accomp_self_conditioning():
    """NADE self-conditioning: roll and SAMPLED tracks' states bit-exact.
    Given tracks' LSTM state is allclose only: their layer-0 input
    projection is recomputed from the teacher features via f32 wxg rows,
    while the sweep accumulates bf16-stored M rows (documented in
    _nade_kernel; the f32 recompute is closer to forced_step semantics).
    Covers both the batched (B=8) and B=1 (VPU lane-reduction) paths."""
    cfg = cfg_for("feedback", decoder_type="rnn-nade")
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    for b in (8, 1):
        h0, c0, v0 = _stacked_state(params, b)
        T, key = 12, jax.random.PRNGKey(5)
        ru, hu, cu = gen_fused.generate_nade(key, params.decoder, h0, c0,
                                             v0, T, interpret=True)
        rc, hc, cc = gen_fused.generate_nade(key, params.decoder, h0, c0,
                                             v0, T, interpret=True,
                                             given=ru, given_tracks=(0, 2))
        np.testing.assert_array_equal(np.asarray(ru), np.asarray(rc))
        np.testing.assert_array_equal(np.asarray(hu[:, 1]),
                                      np.asarray(hc[:, 1]))
        np.testing.assert_array_equal(np.asarray(cu[:, 1]),
                                      np.asarray(cc[:, 1]))
        np.testing.assert_allclose(np.asarray(hu), np.asarray(hc),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(cu), np.asarray(cc),
                                   atol=4e-2)


@pytest.mark.parametrize("dec_type", ["rnn-rbm", "rnn-nade"])
def test_accomp_fused_passthrough_and_coupling(dec_type):
    """multinn._generate_accomp_fused: given tracks pass through bit-exact;
    in feedback mode DIFFERENT given content changes the sampled tracks
    (the conditioning binds through the kernel's merged-frame ctx)."""
    cfg = cfg_for("feedback", decoder_type=dec_type)
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    g1 = jnp.asarray((rng.random((8, 12, K, D)) < 0.3).astype(np.float32))
    g2 = jnp.asarray((rng.random((8, 12, K, D)) < 0.3).astype(np.float32))
    st = multinn.init_state(params, 8)
    key = jax.random.PRNGKey(9)
    fin, r1 = multinn._generate_accomp_fused(params, key, st, g1, (0, 2),
                                             interpret=True)
    _, r2 = multinn._generate_accomp_fused(params, key, st, g2, (0, 2),
                                           interpret=True)
    r1, r2 = np.asarray(r1), np.asarray(r2)
    np.testing.assert_array_equal(r1[:, :, 0], np.asarray(g1)[:, :, 0])
    np.testing.assert_array_equal(r1[:, :, 2], np.asarray(g1)[:, :, 2])
    assert set(np.unique(r1)) <= {0.0, 1.0}
    assert not np.array_equal(r1[:, :, 1], r2[:, :, 1])
    # state contract: ctx reflects the MERGED last frame
    np.testing.assert_array_equal(
        np.asarray(fin.decoder.v_prev[0]), r1[:, -1, 0])


def test_accomp_fused_dbn_passthrough():
    """DBN encoder: the kernel runs in latent space; the given tracks' ROLL
    rows must still pass through bit-exactly (model-space passthrough,
    never re-encoded/decoded — scan-path contract)."""
    cfg = cfg_for("feedback", decoder_type="rnn-nade", encoder_hidden=(6,))
    params = multinn.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    g = jnp.asarray((rng.random((8, 10, K, D)) < 0.3).astype(np.float32))
    st = multinn.init_state(params, 8)
    _, roll = multinn._generate_accomp_fused(params, jax.random.PRNGKey(1),
                                             st, g, (1,), interpret=True)
    roll = np.asarray(roll)
    np.testing.assert_array_equal(roll[:, :, 1], np.asarray(g)[:, :, 1])
    assert set(np.unique(roll)) <= {0.0, 1.0}


def test_accomp_gate_charges_conditioned_extras():
    """The conditioned gates must admit the flagship shapes and stay
    monotone: conditioned=True can only consume MORE VMEM than the
    unconditional gate (never admit a batch the unconditional gate
    refuses)."""
    from multinn_tpu.ops import gen_fused_nade, gen_fused_rbm
    cfg_r = MultINNConfig(n_tracks=5, n_pitches=84, mode="per-track",
                          decoder_type="rnn-rbm", n_hidden=150, n_rnn=100,
                          gen_k=25)
    cfg_n = MultINNConfig(n_tracks=5, n_pitches=84, mode="feedback",
                          decoder_type="rnn-nade", n_hidden=150, n_rnn=100)
    assert gen_fused.supported(cfg_r, 8, 1024, conditioned=True)
    assert gen_fused.supported_nade(cfg_n, 8, 1024, n_given=2)
    for b in (1, 8, 16, 64, 128, 256):
        if gen_fused.supported(cfg_r, b, 1024, conditioned=True):
            assert gen_fused.supported(cfg_r, b, 1024)
        if gen_fused.supported_nade(cfg_n, b, 1024, n_given=4):
            assert gen_fused.supported_nade(cfg_n, b, 1024)
