"""MultINN — the flagship multi-track composition model (SURVEY C11/C12;
reference counterpart ``models/multinn.py`` [K]).

Composes per-track encoder+decoder modules under an inter-track architecture:

  * ``per-track`` [B:9]: independent per-track encoders and decoders. Tracks
    are the natural expert-parallel axis (SURVEY §2.2): per-track params are
    STACKED along a leading track axis and every train/sample op is ``vmap``ed
    over it — on a mesh this axis shards over ``track`` with no collectives.
  * ``feedback`` [B:10]: ONE shared encoder; per-track decoders whose RNNs are
    additionally conditioned on the concatenated latents of ALL tracks from
    the previous step (the cross-track feedback). Training stays fully
    teacher-forced/parallel (the feedback context is a time-shift of encoded
    teacher frames); generation carries the context through the scan — when
    track-sharded this becomes the architecture's single all-gather per step.
  * ``joint``: all tracks concatenated into one (K·D)-dim frame handled by a
    single encoder+decoder (the MuseGAN-style fully-joint wiring; SURVEY C12
    lists such extra modes as likely-present — included for capability cover).
  * ``hybrid``: ONE shared encoder (cross-track weight tying) but fully
    independent per-track decoders — the MuseGAN "hybrid" analogue (shared
    inter-track + private intra-track modeling) [SURVEY C12 extra modes].

MuseGAN-vocabulary aliases (C12): ``jamming`` -> per-track (independent
generators per track) and ``composer`` -> joint (one generator over the
concatenated tracks); normalized at config construction.

API (C11): init / loss / log_likelihood / prime / generate — a unified
forward/loss/sample surface over all tracks. Pianorolls are (B, T, K, D).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flax import struct

from multinn_tpu.models import encoders as enc_mod
from multinn_tpu.models.base import DecoderConfig, get_decoder
from multinn_tpu.models.encoders import EncoderConfig

MODES = ("per-track", "feedback", "joint", "hybrid")
MODE_ALIASES = {"jamming": "per-track", "composer": "joint"}


@dataclasses.dataclass(frozen=True)
class MultINNConfig:
    """Experiment-level model config (SURVEY C17 feeds this)."""

    n_tracks: int = 5
    n_pitches: int = 88
    mode: str = "per-track"
    decoder_type: str = "rnn-rbm"
    encoder_hidden: Tuple[int, ...] = ()     # () = pass-through encoder
    n_hidden: int = 150
    n_rnn: int = 100
    cell: str = "lstm"
    rnn_layers: int = 1
    cd_k: int = 1
    gen_k: int = 10
    w_std: float = 0.01
    remat: bool = False        # gradient-checkpoint the time scans (§5.7)
    # 'bf16' feeds the training hot-path matmuls bf16 (f32 accumulation,
    # f32 master weights — ops/precision.py). Measured lever at
    # scale-stress shapes (H >= 1024); neutral at reference scales.
    matmul_dtype: str = "f32"

    def __post_init__(self):
        if self.mode in MODE_ALIASES:
            object.__setattr__(self, "mode", MODE_ALIASES[self.mode])
        if self.mode not in MODES:
            raise ValueError(
                f"mode must be one of {MODES} (aliases: "
                f"{sorted(MODE_ALIASES)}), got {self.mode}")
        if self.matmul_dtype not in ("f32", "float32", "bf16", "bfloat16"):
            raise ValueError(
                f"matmul_dtype must be f32 or bf16, got {self.matmul_dtype}")

    @property
    def shared_encoder(self) -> bool:
        """One encoder instance for all tracks (feedback/hybrid wiring)."""
        return self.mode in ("feedback", "hybrid")

    # ---- derived sub-configs -------------------------------------------
    def encoder_config(self) -> EncoderConfig:
        n_in = (self.n_pitches * self.n_tracks if self.mode == "joint"
                else self.n_pitches)
        return EncoderConfig(n_in=n_in, hidden_sizes=self.encoder_hidden,
                             w_std=self.w_std)

    def feature_dim(self) -> int:
        return enc_mod.out_dim(self.encoder_config())

    def ctx_dim(self) -> int:
        """Feedback context width: latents of all K tracks, concatenated."""
        return (self.n_tracks * self.feature_dim()
                if self.mode == "feedback" else 0)

    def decoder_config(self) -> DecoderConfig:
        return DecoderConfig(
            n_visible=self.feature_dim(), n_hidden=self.n_hidden,
            n_rnn=self.n_rnn, n_ctx=self.ctx_dim(), cell=self.cell,
            rnn_layers=self.rnn_layers, cd_k=self.cd_k, gen_k=self.gen_k,
            w_std=self.w_std, remat=self.remat)


@struct.dataclass
class MultINNParams:
    encoder: object     # per-track: track-stacked; feedback/joint: single
    decoder: object     # per-track/feedback: track-stacked; joint: single
    cfg: MultINNConfig = struct.field(pytree_node=False)


@struct.dataclass
class MultINNState:
    """Generation state: decoder states (track-stacked where applicable) and
    the feedback context (zeros when unused)."""
    decoder: object
    ctx: Optional[jax.Array]


def _dec(cfg: MultINNConfig):
    return get_decoder(cfg.decoder_type)


def init(key: jax.Array, cfg: MultINNConfig) -> MultINNParams:
    ke, kd = jax.random.split(key)
    ecfg, dcfg = cfg.encoder_config(), cfg.decoder_config()
    dec = _dec(cfg)
    if cfg.mode == "joint":
        return MultINNParams(encoder=enc_mod.init(ke, ecfg),
                             decoder=dec.init(kd, dcfg), cfg=cfg)
    dec_keys = jax.random.split(kd, cfg.n_tracks)
    decoder = jax.vmap(lambda k: dec.init(k, dcfg))(dec_keys)
    if cfg.shared_encoder:
        encoder = enc_mod.init(ke, ecfg)          # shared [B:10] / hybrid
    else:
        enc_keys = jax.random.split(ke, cfg.n_tracks)
        encoder = jax.vmap(lambda k: enc_mod.init(k, ecfg))(enc_keys)
    return MultINNParams(encoder=encoder, decoder=decoder, cfg=cfg)


# ---------------------------------------------------------------------------
# feature-space plumbing
# ---------------------------------------------------------------------------

def _tracks_first(x: jax.Array) -> jax.Array:
    """(B, T, K, D) -> (K, B, T, D)."""
    return jnp.moveaxis(x, 2, 0)


def _encode_tracks(params: MultINNParams, x: jax.Array) -> jax.Array:
    """x: (B, T, K, D) -> DECODER-facing features, tracks-first (K, B, T, F).
    DBN features are BINARY and FROZEN (enc_mod.features, stop-gradient):
    the decoders model exactly the binary latent distribution generation
    samples, and the encoder trains only by greedy CD pre-training —
    soft features were out-of-distribution at generation and joint
    fine-tuning collapsed the channel (r4 fix; rationale in
    encoders.features)."""
    cfg = params.cfg
    xk = _tracks_first(x)
    if cfg.shared_encoder:              # shared encoder broadcast over tracks
        return enc_mod.features(params.encoder, xk)
    return jax.vmap(enc_mod.features)(params.encoder, xk)


def _flatten_latents(vs: jax.Array) -> jax.Array:
    """Track-major latents (K, B, F) -> feedback-context rows (B, K*F)."""
    k, b, f = vs.shape
    return jnp.moveaxis(vs, 0, 1).reshape(b, k * f)


def _feedback_ctx(feats_k: jax.Array, seq=None,
                  prefix: Optional[jax.Array] = None) -> jax.Array:
    """Teacher-forced feedback context: concat latents of all tracks at t-1.
    feats_k: (K, B, T, F) -> ctx (B, T, K·F); row t=0 is ``prefix``
    (B, K·F) — a carried cross-track context from an earlier generate/prime
    (prime()) — or zeros (fresh state / training).

    Under time sharding (``seq``: parallel.seqpipe.SeqSpec) the shift crosses
    chunk boundaries — the one-frame latent halo rides a single ppermute."""
    k, b, t, f = feats_k.shape
    lat = jnp.moveaxis(feats_k, 0, 2).reshape(b, t, k * f)
    if seq is not None:
        if prefix is not None:
            raise ValueError("carried-ctx prefix is a priming-path feature; "
                             "the seqpipe halo path starts from zeros")
        from multinn_tpu.parallel import seqpipe
        return seqpipe.shift_right_seq(lat, seq)
    first = (jnp.zeros_like(lat[:, :1]) if prefix is None
             else prefix[:, None].astype(lat.dtype))
    return jnp.concatenate([first, lat[:, :-1]], axis=1)


def _mean_tree(tree):
    return jax.tree.map(lambda a: jnp.mean(a, axis=0), tree)


# ---------------------------------------------------------------------------
# loss / likelihood
# ---------------------------------------------------------------------------

def loss(params: MultINNParams, key: jax.Array, x: jax.Array,
         detailed: bool = True, frame_mask: Optional[jax.Array] = None,
         seq=None):
    """Unified teacher-forced loss over all tracks. x: (B, T, K, D).
    Returns (scalar_loss, metrics) — metrics averaged over tracks, plus
    per-track losses under 'loss_per_track'. ``detailed=False`` is the
    trainer's hot path (loss-only metrics). ``seq`` (seqpipe.SeqSpec): x is
    this device's time chunk; the recurrence pipelines over the seq axis."""
    cfg = params.cfg
    dec = _dec(cfg)
    if cfg.mode == "joint":
        b, t, k, d = x.shape
        feats = enc_mod.features(params.encoder, x.reshape(b, t, k * d))
        total, metrics = dec.loss(params.decoder, key, feats,
                                  detailed=detailed,
                                  frame_mask=frame_mask, seq=seq)
        # the documented metrics contract includes 'loss_per_track' in every
        # mode; joint has ONE decoder over the concatenated tracks -> (1,)
        metrics = dict(metrics)
        metrics["loss_per_track"] = total[None]
        return total, metrics

    feats_k = _encode_tracks(params, x)                  # (K, B, T, F)
    keys = jax.random.split(key, cfg.n_tracks)
    if cfg.mode == "feedback":
        ctx = _feedback_ctx(feats_k, seq)                # (B, T, K·F)
        losses, metrics = jax.vmap(
            lambda p, kk, xx: dec.loss(p, kk, xx, ctx=ctx, detailed=detailed,
                                       frame_mask=frame_mask, seq=seq)
        )(params.decoder, keys, feats_k)
    else:
        losses, metrics = jax.vmap(
            lambda p, kk, xx: dec.loss(p, kk, xx, detailed=detailed,
                                       frame_mask=frame_mask, seq=seq)
        )(params.decoder, keys, feats_k)
    metrics = _mean_tree(metrics)
    metrics["loss_per_track"] = losses
    total = jnp.mean(losses)
    metrics["loss"] = total
    return total, metrics


def log_likelihood(params: MultINNParams, key: jax.Array,
                   x: jax.Array,
                   frame_mask: Optional[jax.Array] = None,
                   seq=None) -> jax.Array:
    """Per-sequence LL summed over tracks and time, (B,). Exact for NADE
    decoders, pseudo-LL proxy for RBM decoders (intractable partition fn).
    Under ``seq`` the sum covers this device's time chunk (psum upstream)."""
    cfg = params.cfg
    dec = _dec(cfg)
    if cfg.mode == "joint":
        b, t, k, d = x.shape
        feats = enc_mod.features(params.encoder, x.reshape(b, t, k * d))
        return dec.log_likelihood_proxy(params.decoder, key, feats,
                                        frame_mask=frame_mask, seq=seq)
    feats_k = _encode_tracks(params, x)
    keys = jax.random.split(key, cfg.n_tracks)
    if cfg.mode == "feedback":
        ctx = _feedback_ctx(feats_k, seq)
        lls = jax.vmap(
            lambda p, kk, xx: dec.log_likelihood_proxy(
                p, kk, xx, ctx=ctx, frame_mask=frame_mask, seq=seq)
        )(params.decoder, keys, feats_k)
    else:
        lls = jax.vmap(
            lambda p, kk, xx: dec.log_likelihood_proxy(
                p, kk, xx, frame_mask=frame_mask, seq=seq)
        )(params.decoder, keys, feats_k)
    return jnp.sum(lls, axis=0)                          # (B,)


def conditional_logits(params: MultINNParams, x: jax.Array, seq=None):
    """Teacher-forced conditional logits + targets for NADE decoders — the
    Gauss-Newton linearization point for the Hessian-free optimizer
    (training/hf.py). x: (B, T, K, D).

    Returns (logits, targets), both track-and-time-major:
      per-track / feedback: (K, T, B, F);  joint: (1, T, B, K·D).
    The exact NLL loss (multinn.loss) equals the frame-masked Bernoulli
    cross-entropy of ``logits`` against ``targets`` under the trainer's
    normalization (see hf._ce_loss, equality-tested)."""
    cfg = params.cfg
    if cfg.decoder_type != "rnn-nade":
        raise ValueError("conditional_logits requires an rnn-nade decoder "
                         "(RBM CD training has no GGN linearization)")
    from multinn_tpu.models import rnn_nade
    if cfg.mode == "joint":
        b, t, k, d = x.shape
        feats = enc_mod.features(params.encoder, x.reshape(b, t, k * d))
        logits = rnn_nade.conditional_logits(params.decoder, feats, seq=seq)
        return logits[None], jnp.swapaxes(feats, 0, 1)[None]
    feats_k = _encode_tracks(params, x)                  # (K, B, T, F)
    ctx = (_feedback_ctx(feats_k, seq) if cfg.mode == "feedback" else None)
    logits_k = jax.vmap(
        lambda p, xx: rnn_nade.conditional_logits(p, xx, ctx=ctx, seq=seq)
    )(params.decoder, feats_k)                           # (K, T, B, F)
    return logits_k, jnp.swapaxes(feats_k, 1, 2)         # targets (K, T, B, F)


# ---------------------------------------------------------------------------
# state / priming / generation
# ---------------------------------------------------------------------------

def init_state(params: MultINNParams, batch: int) -> MultINNState:
    cfg = params.cfg
    dec = _dec(cfg)
    if cfg.mode == "joint":
        return MultINNState(
            decoder=dec.init_state(params.decoder, (batch,)), ctx=None)
    states = jax.vmap(lambda p: dec.init_state(p, (batch,)))(params.decoder)
    ctx = (jnp.zeros((batch, cfg.ctx_dim()))
           if cfg.mode == "feedback" else None)
    return MultINNState(decoder=states, ctx=ctx)


def prime(params: MultINNParams, state: MultINNState,
          seed: jax.Array) -> MultINNState:
    """Advance RNN states over a seed pianoroll (B, T, K, D) (C14 priming)."""
    cfg = params.cfg
    dec = _dec(cfg)
    if cfg.mode == "joint":
        b, t, k, d = seed.shape
        feats = enc_mod.features(params.encoder, seed.reshape(b, t, k * d))
        return MultINNState(
            decoder=dec.prime(params.decoder, state.decoder, feats), ctx=None)
    feats_k = _encode_tracks(params, seed)               # (K, B, T, F)
    if cfg.mode == "feedback":
        # ctx(t) = latents(t-1); the INCOMING state's carried cross-track
        # context conditions the first seed frame's RNN advance, so chained
        # generate -> prime keeps the training/generation semantics. Fresh
        # states carry zero ctx (init_state), making this bit-exact with a
        # zero-prefix for the fresh-state path.
        ctx_seq = _feedback_ctx(feats_k, prefix=state.ctx)
        states = jax.vmap(
            lambda p, st, xx: dec.prime(p, st, xx, ctx=ctx_seq)
        )(params.decoder, state.decoder, feats_k)
        return MultINNState(decoder=states,
                            ctx=_flatten_latents(feats_k[:, :, -1]))
    states = jax.vmap(
        lambda p, st, xx: dec.prime(p, st, xx)
    )(params.decoder, state.decoder, feats_k)
    return MultINNState(decoder=states, ctx=None)


def tempered_params(params: MultINNParams,
                    temperature: float) -> MultINNParams:
    """Sampling-temperature transform on the DECODER params (exact — see
    rnn_rbm/rnn_nade.tempered_params for the per-family math; the transform
    is elementwise, so it applies unchanged to track-stacked params).
    Encoder params are untouched: priming/encoding must stay calibrated,
    and the DBN decode conditional is tempered at its logits instead
    (_decode_sample). T=1 returns ``params`` unchanged (bit-exact)."""
    if temperature == 1.0:
        return params
    dec = _dec(params.cfg)
    return params.replace(
        decoder=dec.tempered_params(params.decoder, temperature))


def _decode_sample(encoder, key: jax.Array, lat: jax.Array,
                   beta: float = 1.0) -> jax.Array:
    """Latent -> binary pianoroll by SAMPLING the DBN decode conditional
    p(v | h) — the RBM's generative downward direction. Thresholding the
    probabilities at 0.5 is NOT equivalent for sparse music: CD training
    matches the decode probabilities' MEAN to the data marginal, so at
    density ~0.01 the per-pitch probabilities sit far below 0.5 and a
    threshold emits silence (measured r4: density 0.0); sampling realizes
    the marginal exactly. ``beta`` = 1/temperature scales the conditional's
    logits (generation temperature; static float, 1.0 = untempered)."""
    from multinn_tpu.ops import sampling
    logits = enc_mod.decode_logits(encoder, lat)
    if beta != 1.0:
        logits = logits * beta
    return sampling.bernoulli(key, jax.nn.sigmoid(logits))


def sample_step(params: MultINNParams, key: jax.Array, state: MultINNState,
                k: Optional[int] = None, temperature: float = 1.0
                ) -> Tuple[MultINNState, jax.Array]:
    """One generation step over all tracks -> (state, frame (B, K, D) binary
    pianoroll). The feedback mode threads the cross-track context — on a
    track-sharded mesh the context assembly is the per-step all_gather.
    ``temperature`` (static float): sampling temperature — applied as the
    exact decoder-param transform plus the DBN decode-logit scale. When
    stepping in your own loop, hoist with ``tempered_params`` once and call
    ``_sample_step`` with the decode beta instead of re-scaling per step
    (multinn.generate does)."""
    return _sample_step(tempered_params(params, temperature), key, state,
                        k, 1.0 / temperature)


def _sample_step(params: MultINNParams, key: jax.Array, state: MultINNState,
                 k: Optional[int] = None, dec_beta: float = 1.0
                 ) -> Tuple[MultINNState, jax.Array]:
    """sample_step body: ``params`` are already temperature-transformed;
    ``dec_beta`` tempers only the DBN decode conditional."""
    cfg = params.cfg
    dec = _dec(cfg)
    if cfg.mode == "joint":
        key, kd = jax.random.split(key)
        st, v = dec.sample_step(params.decoder, key, state.decoder, k=k)
        if cfg.encoder_hidden:
            roll = _decode_sample(params.encoder, kd, v, beta=dec_beta)
        else:
            roll = v
        frame = roll.reshape(roll.shape[0], cfg.n_tracks, cfg.n_pitches)
        return MultINNState(decoder=st, ctx=None), frame

    key, kd = jax.random.split(key)
    keys = jax.random.split(key, cfg.n_tracks)
    if cfg.mode == "feedback":
        states, vs = jax.vmap(
            lambda p, kk, st: dec.sample_step(p, kk, st, ctx=state.ctx, k=k)
        )(params.decoder, keys, state.decoder)           # vs: (K, B, F)
        new_state = MultINNState(decoder=states,
                                 ctx=_flatten_latents(vs))
    else:
        states, vs = jax.vmap(
            lambda p, kk, st: dec.sample_step(p, kk, st, k=k)
        )(params.decoder, keys, state.decoder)
        new_state = MultINNState(decoder=states, ctx=None)
    if not cfg.encoder_hidden:
        return new_state, jnp.moveaxis(vs, 0, 1)         # (B, K, D)
    if cfg.shared_encoder:              # feedback/hybrid: one decode
        rolls = _decode_sample(params.encoder, kd, vs, beta=dec_beta)
    else:                               # per-track encoders under vmap
        kds = jax.random.split(kd, cfg.n_tracks)
        rolls = jax.vmap(
            lambda p, kk, v: _decode_sample(p, kk, v, beta=dec_beta)
        )(params.encoder, kds, vs)
    return new_state, jnp.moveaxis(rolls, 0, 1)          # (B, K, D)


def generate(params: MultINNParams, key: jax.Array, state: MultINNState,
             n_steps: int, fused: Optional[bool] = None,
             k: Optional[int] = None, temperature: float = 1.0
             ) -> Tuple[MultINNState, jax.Array]:
    """Autoregressive multi-track generation as ONE device program.
    Returns (state, pianoroll (B, n_steps, K, D)).

    ``fused`` selects the whole-generation Pallas kernel
    (ops/gen_fused.py: the full T-step loop incl. Gibbs chains, feedback
    context and LSTM advance in one kernel, state resident in VMEM; both
    kernels are batched — the roll streams to HBM per step).
    None = auto: fused on TPU when the config qualifies (any encoder —
    DBN latent rolls decode to pianoroll in XLA after the kernel; LSTM
    cells of any stack depth; any inter-track mode — joint enters as one
    track of the joint feature width; rnn-rbm any batch the VMEM gate
    admits, rnn-nade batch 1 or a multiple of 8). Both paths sample the
    same distribution; RNG streams differ (ops/sampling.py contract).

    ``temperature`` (static float, default 1.0 = the model distribution):
    sampling temperature. Implemented as an EXACT decoder-param transform
    (tempered_params — the fused kernels need no changes and temper
    identically to the scan path) plus a logit scale on the DBN decode
    conditional; the transform is applied ONCE here, outside the scan."""
    cfg = params.cfg
    batch = (state.decoder.v_prev.shape[1] if cfg.mode != "joint"
             else state.decoder.v_prev.shape[0])
    if fused is None:
        from multinn_tpu.ops import gen_fused
        fused = (jax.default_backend() == "tpu"
                 and (gen_fused.supported(cfg, batch, n_steps, gen_k=k)
                      or gen_fused.supported_nade(cfg, batch, n_steps)))
    params = tempered_params(params, temperature)
    dec_beta = 1.0 / temperature
    if fused:
        return _generate_fused(params, key, state, n_steps, k=k,
                               dec_beta=dec_beta)

    keys = jax.random.split(key, n_steps)

    def body(st, kk):
        return _sample_step(params, kk, st, k=k, dec_beta=dec_beta)

    final, frames = jax.lax.scan(body, state, keys)      # (T, B, K, D)
    return final, jnp.moveaxis(frames, 0, 1)


def generate_accompaniment(params: MultINNParams, key: jax.Array,
                           state: MultINNState, given: jax.Array,
                           given_tracks: Tuple[int, ...],
                           k: Optional[int] = None,
                           temperature: float = 1.0,
                           fused: Optional[bool] = None,
                           subset: bool = True
                           ) -> Tuple[MultINNState, jax.Array]:
    """Track-conditional generation ("accompaniment"): fix the tracks in
    ``given_tracks`` to the frames of ``given`` (B, T, K, D) and sample the
    remaining tracks — give a melody, generate the band. Returns
    (state, roll (B, T, K, D)) with roll[:, :, given_tracks] == given's
    slices BIT-EXACTLY (model-space passthrough, never re-encoded).

    Conditioning semantics per inter-track mode: in ``feedback`` the given
    tracks' (encoder) latents enter every other track's cross-track context
    each step — the sampled tracks genuinely CONDITION on the given music.
    In ``per-track``/``hybrid`` the decoders are independent, so this
    merely merges given tracks into the output (documented, still useful
    for assembling stems); ``joint`` has one decoder over all tracks and
    would need within-frame conditional RBM/NADE sampling — not supported,
    raises.

    Mechanics: one lax.scan; per step every track runs the decoder's
    ``sample_frame`` (uniform vmap), given tracks' frames are replaced by
    their teacher-forced features, and ALL tracks advance via
    ``forced_step`` — so given tracks' RNNs see exactly the priming
    semantics. ``temperature`` tempers only the SAMPLED tracks' conditionals
    (given tracks are passthrough). ``given_tracks`` is static.

    ``fused`` (None = auto like generate()): run the whole conditional
    loop in the whole-generation Pallas kernels instead — the given
    tracks' teacher features stream into the kernel per step (ops/
    gen_fused_{rbm,nade}; same distribution, kernel RNG stream). Force
    False on a multi-device mesh (the kernels are single-chip programs;
    training/generator.py does).

    ``subset`` (scan path only): True runs ``sample_frame`` only for the
    sampled complement (gathers a K_samp-subset of the decoder stack —
    the single-chip win, ~1.1-1.2x at flagship shapes). On a TRACK-sharded
    mesh the per-step subset gather of K-sharded decoder state inserts
    cross-shard collectives and a K_samp stack that need not partition
    over the track axis — pass subset=False there to keep the uniformly
    sharded all-K vmap with mask-merge (bit-exact either way; per-track
    keys are tkeys[track] in both)."""
    cfg = params.cfg
    if cfg.mode == "joint":
        raise ValueError(
            "accompaniment needs per-track decoders; joint mode has one "
            "decoder over all tracks (within-frame conditional sampling "
            "is not supported)")
    given_tracks = tuple(sorted(set(int(i) for i in given_tracks)))
    if not given_tracks:
        raise ValueError("given_tracks is empty — use generate()")
    if any(not 0 <= i < cfg.n_tracks for i in given_tracks):
        raise ValueError(f"given_tracks {given_tracks} out of range for "
                         f"n_tracks={cfg.n_tracks}")
    if len(given_tracks) == cfg.n_tracks:
        raise ValueError("all tracks given — nothing to sample")
    b, n_steps, kk, d = given.shape
    if kk != cfg.n_tracks or d != cfg.n_pitches:
        raise ValueError(f"given roll (B, T, K, D)={given.shape} does not "
                         f"match model (K={cfg.n_tracks}, D={cfg.n_pitches})")
    if fused is None:
        from multinn_tpu.ops import gen_fused
        fused = (jax.default_backend() == "tpu"
                 and (gen_fused.supported(cfg, b, n_steps, gen_k=k,
                                          conditioned=True)
                      or gen_fused.supported_nade(
                          cfg, b, n_steps, n_given=len(given_tracks))))
    dec = _dec(cfg)
    params = tempered_params(params, temperature)
    dec_beta = 1.0 / temperature
    given = given.astype(jnp.float32)
    if fused:
        return _generate_accomp_fused(params, key, state, given,
                                      given_tracks, k=k, dec_beta=dec_beta)
    # teacher-forced decoder-facing features of the given roll (identity
    # for pass-through encoders; binary frozen DBN features otherwise) —
    # only the given tracks' rows are consumed
    feats_g = _encode_tracks(params, given)              # (K, B, T, F)
    feats_tm = jnp.moveaxis(feats_g, 2, 0)               # (T, K, B, F)
    given_tm = jnp.transpose(given, (1, 2, 0, 3))        # (T, K, B, D)
    mask = jnp.zeros((cfg.n_tracks, 1, 1), jnp.float32).at[
        jnp.asarray(given_tracks), 0, 0].set(1.0)        # (K, 1, 1)
    # the expensive per-step work is sample_frame (gen_k Gibbs sweeps / the
    # NADE ancestral sweep) — subset=True runs it ONLY for the sampled
    # complement; given tracks' frames come from feats_t and never consume
    # a sample. Per-track keys stay tkeys[track], so this is bit-exact with
    # the subset=False all-K mask-merge (given_tracks is static).
    samp_idx = jnp.asarray([i for i in range(cfg.n_tracks)
                            if i not in given_tracks])
    dec_params_s = jax.tree.map(lambda a: a[samp_idx], params.decoder)
    keys = jax.random.split(key, n_steps)
    feedback = cfg.mode == "feedback"

    def body(st, inp):
        kk_key, feats_t, given_t = inp                   # (K,B,F), (K,B,D)
        key1, kd = jax.random.split(kk_key)
        tkeys = jax.random.split(key1, cfg.n_tracks)
        if subset:
            st_s = jax.tree.map(lambda a: a[samp_idx], st.decoder)
            vs_s = jax.vmap(
                lambda p, kx, s: dec.sample_frame(p, kx, s, k=k)
            )(dec_params_s, tkeys[samp_idx], st_s)       # (K_samp, B, F)
            v_final = feats_t.at[samp_idx].set(vs_s)
        else:         # uniform all-K sweep (track-sharded mesh path)
            vs = jax.vmap(
                lambda p, kx, s: dec.sample_frame(p, kx, s, k=k)
            )(params.decoder, tkeys, st.decoder)         # (K, B, F)
            # select, don't blend: 0.0 * NaN would propagate a non-finite
            # sampled value into a GIVEN track's output and break the
            # bit-exact passthrough guarantee for diverged models
            v_final = jnp.where(mask > 0, feats_t, vs)
        ctx_arg = st.ctx if feedback else None
        states = jax.vmap(
            lambda p, s, v: dec.forced_step(p, s, v, ctx_arg)
        )(params.decoder, st.decoder, v_final)
        new_ctx = _flatten_latents(v_final) if feedback else None
        if not cfg.encoder_hidden:                       # features ARE rolls
            roll_t = v_final
        else:
            if cfg.shared_encoder:
                dec_roll = _decode_sample(params.encoder, kd, v_final,
                                          beta=dec_beta)
            else:
                kds = jax.random.split(kd, cfg.n_tracks)
                dec_roll = jax.vmap(
                    lambda p, kx, v: _decode_sample(p, kx, v, beta=dec_beta)
                )(params.encoder, kds, v_final)
            roll_t = jnp.where(mask > 0, given_t, dec_roll)
        return MultINNState(decoder=states, ctx=new_ctx), roll_t

    final, rolls = jax.lax.scan(body, state, (keys, feats_tm, given_tm))
    return final, jnp.transpose(rolls, (2, 0, 1, 3))     # (B, T, K, D)


def _generate_fused(params: MultINNParams, key: jax.Array,
                    state: MultINNState, n_steps: int,
                    interpret: bool = False,
                    k: Optional[int] = None,
                    dec_beta: float = 1.0
                    ) -> Tuple[MultINNState, jax.Array]:
    """Dispatch to the whole-generation fused kernel (see ops/gen_fused.py)
    and rebuild the MultINNState contract from the kernel outputs.
    ``params`` arrive already temperature-transformed (generate());
    ``dec_beta`` tempers the XLA decode-conditional pass only."""
    from multinn_tpu.models import rnn_nade, rnn_rbm
    from multinn_tpu.nn import rnn as rnn_nn
    from multinn_tpu.ops import gen_fused
    cfg = params.cfg
    joint = cfg.mode == "joint"
    # joint mode: ONE decoder over the concatenated tracks — enters the
    # kernels as a 1-track stack of width K*D (gen_fused._eff_dims)
    dec_params = (gen_fused._stack_joint(params.decoder) if joint
                  else params.decoder)
    dec_state = (gen_fused._stack_joint(state.decoder) if joint
                 else state.decoder)
    # cell states stacked over layers: (L, Keff, B, U). Vanilla tanh cells
    # carry no c — feed zeros (the kernel's c scratch is inert for them)
    vanilla = cfg.cell == "vanilla"
    h0 = jnp.stack([st.h for st in dec_state.cell])
    c0 = (jnp.zeros_like(h0) if vanilla
          else jnp.stack([st.c for st in dec_state.cell]))
    if cfg.decoder_type == "rnn-nade":
        roll, h_f, c_f = gen_fused.generate_nade(
            key, dec_params, h0, c0, dec_state.v_prev,
            n_steps, interpret=interpret)          # roll (B, T, Keff, Deff)
        state_cls = rnn_nade.State
    else:
        roll, h_f, c_f = gen_fused.generate_rbm(
            key, dec_params, h0, c0, dec_state.v_prev,
            n_steps, cfg.gen_k if k is None else k, interpret=interpret)
        state_cls = rnn_rbm.State                  # roll (B, T, Keff, Deff)
    v_last = jnp.moveaxis(roll[:, -1], 0, 1)             # (Keff, B, Deff)
    n_layers = len(dec_state.cell)
    b = roll.shape[0]

    def cell_state(h, c):
        return (rnn_nn.VanillaRNNState(h=h) if vanilla
                else rnn_nn.LSTMState(h=h, c=c))

    if joint:
        new_dec = state_cls(
            cell=tuple(cell_state(h_f[l, 0], c_f[l, 0])
                       for l in range(n_layers)),
            v_prev=v_last[0])
        if cfg.encoder_hidden:
            # the kernel generated LATENT frames; SAMPLE the decode
            # conditional over the whole roll in one batched XLA pass
            # (scan-path parity: sample_step's _decode_sample); the fold_in
            # stream is independent of the kernel's key_to_seeds stream
            roll = _decode_sample(params.encoder,
                                  jax.random.fold_in(key, 0x5eed),
                                  roll[:, :, 0], beta=dec_beta)[:, :, None]
        roll = roll.reshape(b, n_steps, cfg.n_tracks, cfg.n_pitches)
        return MultINNState(decoder=new_dec, ctx=None), roll
    new_dec = state_cls(
        cell=tuple(cell_state(h_f[l], c_f[l])
                   for l in range(n_layers)),
        v_prev=v_last)
    ctx = (_flatten_latents(v_last) if cfg.mode == "feedback" else None)
    if cfg.encoder_hidden:
        # latent roll -> pianoroll: SAMPLE the decode conditional, shared
        # encoder in one pass (feedback/hybrid) or per-track under vmap —
        # exactly sample_step's _decode_sample, amortized over all T
        lat_k = jnp.moveaxis(roll, 2, 0)                 # (K, B, T, F)
        kd = jax.random.fold_in(key, 0x5eed)
        if cfg.shared_encoder:
            out = _decode_sample(params.encoder, kd, lat_k, beta=dec_beta)
        else:
            out = jax.vmap(
                lambda p, kk, v: _decode_sample(p, kk, v, beta=dec_beta)
            )(params.encoder, jax.random.split(kd, cfg.n_tracks), lat_k)
        roll = jnp.moveaxis(out, 0, 2)
    return MultINNState(decoder=new_dec, ctx=ctx), roll


def _generate_accomp_fused(params: MultINNParams, key: jax.Array,
                           state: MultINNState, given: jax.Array,
                           given_tracks: Tuple[int, ...],
                           k: Optional[int] = None,
                           dec_beta: float = 1.0,
                           interpret: bool = False
                           ) -> Tuple[MultINNState, jax.Array]:
    """generate_accompaniment on the whole-generation fused kernels: the
    given tracks' teacher-forced FEATURES stream into the kernel per step
    and replace those tracks in the emitted/carried frame (see
    ops/gen_fused_{rbm,nade} — exact conditional sampling because the
    per-track block layouts make within-frame sweeps track-independent).
    ``params`` arrive already temperature-transformed; given tracks' roll
    rows pass through BIT-EXACTLY (model-space passthrough, same contract
    as the scan path). Non-joint modes only (the caller raises for joint)."""
    from multinn_tpu.models import rnn_nade, rnn_rbm
    from multinn_tpu.nn import rnn as rnn_nn
    from multinn_tpu.ops import gen_fused
    cfg = params.cfg
    n_steps = given.shape[1]
    feats_g = _encode_tracks(params, given)              # (K, B, T, F)
    feats_bt = jnp.transpose(feats_g, (1, 2, 0, 3))      # (B, T, K, F)
    vanilla = cfg.cell == "vanilla"
    dec_state = state.decoder
    h0 = jnp.stack([st.h for st in dec_state.cell])
    c0 = (jnp.zeros_like(h0) if vanilla
          else jnp.stack([st.c for st in dec_state.cell]))
    gt = tuple(given_tracks)
    if cfg.decoder_type == "rnn-nade":
        roll, h_f, c_f = gen_fused.generate_nade(
            key, params.decoder, h0, c0, dec_state.v_prev, n_steps,
            interpret=interpret, given=feats_bt, given_tracks=gt)
        state_cls = rnn_nade.State
    else:
        roll, h_f, c_f = gen_fused.generate_rbm(
            key, params.decoder, h0, c0, dec_state.v_prev, n_steps,
            cfg.gen_k if k is None else k, interpret=interpret,
            given=feats_bt, given_tracks=gt)
        state_cls = rnn_rbm.State                  # roll (B, T, K, F)
    v_last = jnp.moveaxis(roll[:, -1], 0, 1)             # (K, B, F)
    n_layers = len(dec_state.cell)

    def cell_state(h, c):
        return (rnn_nn.VanillaRNNState(h=h) if vanilla
                else rnn_nn.LSTMState(h=h, c=c))

    new_dec = state_cls(
        cell=tuple(cell_state(h_f[l], c_f[l]) for l in range(n_layers)),
        v_prev=v_last)
    ctx = (_flatten_latents(v_last) if cfg.mode == "feedback" else None)
    if cfg.encoder_hidden:
        # latent roll -> pianoroll (sample the decode conditional, exactly
        # _generate_fused's pass), then the given tracks' ROLL rows take
        # the user's given verbatim (scan-path contract: model-space
        # passthrough, never re-encoded/decoded)
        lat_k = jnp.moveaxis(roll, 2, 0)                 # (K, B, T, F)
        kd = jax.random.fold_in(key, 0x5eed)
        if cfg.shared_encoder:
            out = _decode_sample(params.encoder, kd, lat_k, beta=dec_beta)
        else:
            out = jax.vmap(
                lambda p, kk, v: _decode_sample(p, kk, v, beta=dec_beta)
            )(params.encoder, jax.random.split(kd, cfg.n_tracks), lat_k)
        roll = jnp.moveaxis(out, 0, 2)
        roll = roll.at[:, :, jnp.asarray(gt)].set(
            given[:, :, jnp.asarray(gt)])
    return MultINNState(decoder=new_dec, ctx=ctx), roll
