"""Encoders (SURVEY C10; reference counterpart ``modules/encoders/`` [K]).

Two encoder types behind one contract:

  * pass-through ("pass"): identity — the decoder models raw pianoroll frames.
  * DBN ("dbn"): a stack of RBMs; the deterministic upward pass
    h^{l+1} = σ(h^l W_l + bh_l) produces latent features, the downward pass
    σ(h W_lᵀ + bv_l) decodes back to pianoroll space. Supports greedy
    layer-wise CD pre-training (SURVEY C13 pre-training hook): layer l is
    trained as an RBM on the (deterministic) layer-(l-1) features.

Contract (all pure functions; params is a tuple of RBMParams, empty = pass):

    init(key, cfg)                  -> Params
    encode(params, x)               -> features (..., F_out)
    decode(params, h)               -> pianoroll probs (..., F_in)
    out_dim(cfg)                    -> F_out
    layer_inputs(params, x, layer)  -> features feeding RBM ``layer``
    pretrain_loss(params, key, x, layer, k) -> CD-k loss for that layer

The feedback architecture (C12b) shares ONE encoder params pytree across all
tracks [B:10]; the per-track architecture gives each track its own [B:9].
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from multinn_tpu.nn import rbm as rbm_nn
from multinn_tpu.ops import precision
from multinn_tpu.ops import gibbs as gibbs_ops


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """hidden_sizes=() means pass-through (identity).

    ``encode`` returns mean-field PROBABILITIES (deterministic σ upward
    pass); DECODER-facing features go through ``features`` instead, which
    binarizes and freezes them — the contract every training/eval/priming
    path uses (see features() for the measured rationale). Pianoroll
    outputs SAMPLE the decode conditional at generation (multinn
    _decode_sample)."""

    n_in: int
    hidden_sizes: Tuple[int, ...] = ()
    w_std: float = 0.01


Params = Tuple[rbm_nn.RBMParams, ...]


def init(key: jax.Array, cfg: EncoderConfig) -> Params:
    sizes = (cfg.n_in, *cfg.hidden_sizes)
    keys = jax.random.split(key, max(len(cfg.hidden_sizes), 1))
    return tuple(
        rbm_nn.init(keys[i], sizes[i], sizes[i + 1], w_std=cfg.w_std)
        for i in range(len(cfg.hidden_sizes)))


def out_dim(cfg: EncoderConfig) -> int:
    return cfg.hidden_sizes[-1] if cfg.hidden_sizes else cfg.n_in


def encode(params: Params, x: jax.Array,
           key: jax.Array | None = None) -> jax.Array:
    """Deterministic upward pass (probabilities); if ``key`` is given the
    final layer is Bernoulli-sampled instead (sample_output mode)."""
    h = x
    for i, layer in enumerate(params):
        h = jax.nn.sigmoid(precision.mm(h, layer.w) + layer.bh)
        if key is not None and i == len(params) - 1:
            h = rbm_nn._bernoulli(key, h)
    return h


def features(params: Params, x: jax.Array) -> jax.Array:
    """DECODER-facing features: encode() then ≥0.5-binarize, STOP-GRADIENT
    (DBN only; pass-through encoders return x unchanged).

    Two deliberate choices, both fixing measured r4 defects:

    * BINARY (not mean-field probabilities): the decoders MODEL these
      features as their visible data and generation SAMPLES binary latents
      from them — training on soft probabilities made generated latents
      out-of-distribution for the decode stack (measured: a converged DBN
      feedback RNN-NADE generated pianoroll density 0.98 vs corpus ~0.01).
    * FROZEN (no gradient; the encoder is trained by greedy layer-wise CD
      pre-training only — the classic DBN recipe and the reference's
      module-wise staging, SURVEY C10/C13 'encoders first, then decoders'):
      letting the decoder NLL fine-tune the encoder collapses the latent
      channel — the encoder minimizes the decoder's loss by making latents
      CONSTANT (measured twice: 40 joint epochs drove every latent to 1.0,
      latent std 0.0, NADE NLL 0.04/frame, even from a well-pretrained
      init). Gradients stop here so the channel keeps the information CD
      put into it."""
    if not params:
        return x
    h = encode(params, x)
    return jax.lax.stop_gradient((h >= 0.5).astype(h.dtype))


def decode_logits(params: Params, h: jax.Array) -> jax.Array:
    """Downward pass returning the FINAL layer's pre-sigmoid logits (the
    pianoroll-space decode conditional p(v|·) = σ(logits); intermediate
    layers still pass mean-field probabilities downward). Exposed so
    generation-time temperature can scale the sampled conditional's logits
    (multinn._decode_sample) without touching the shared layer weights —
    scaling ``layer.w`` would also perturb the upward encode pass."""
    v = h
    for layer in reversed(params[1:]):
        v = jax.nn.sigmoid(precision.mm(v, layer.w.T) + layer.bv)
    first = params[0]
    return precision.mm(v, first.w.T) + first.bv


def decode(params: Params, h: jax.Array) -> jax.Array:
    """Downward pass to pianoroll-space probabilities (identity for the
    pass-through encoder, matching encode)."""
    if not params:
        return h
    return jax.nn.sigmoid(decode_logits(params, h))


def init_visible_biases(params: Params, x: jax.Array,
                        eps: float = 1e-4) -> Params:
    """Set each RBM layer's visible bias to logit(marginal) of its input
    features (Hinton 2010 "A practical guide to training RBMs" §8) —
    layer 0 from the data x, upper layers from the chained σ features.

    Measured r4 (synthetic corpus, density 0.0098): without this, CD on
    sparse pianorolls spends its first ~10^4 steps escaping the all-off
    lazy optimum — a 12-epoch pretrain left the decode conditional 6.5×
    too dense, and every generated pianoroll inherited that density even
    with PERFECT latent dynamics (the defect behind BASELINE's feedback
    density rows). With it the decode marginal equals the data marginal
    from step 0 and stays calibrated while CD learns the h-dependence."""
    if not params:
        return params
    out = []
    h = x.reshape(-1, x.shape[-1])
    for layer in params:
        m = jnp.clip(jnp.mean(h, axis=0), eps, 1.0 - eps)
        out.append(layer.replace(bv=jnp.log(m) - jnp.log1p(-m)))
        h = jax.nn.sigmoid(precision.mm(h, layer.w) + layer.bh)
    return tuple(out)


def decode_calibration(params: Params, x: jax.Array):
    """Reconstruction calibration of the decode conditional: encode x to
    the decoder-facing binary features, decode back, compare marginals.
    Returns a dict of jnp scalars:

      data_mean      — marginal of the data
      decode_mean    — marginal of the decode probabilities p(v|features(x))
      p_on_given_off — mean decode probability on bits that are 0 in x
      p_on_given_on  — mean decode probability on bits that are 1 in x

    decode_mean/data_mean far from 1 means generation produces rolls that
    are systematically too dense/sparse REGARDLESS of decoder quality (the
    latent dynamics can be perfect — the decode stage re-scales density);
    the trainer warns on ratios outside [0.5, 2] after pre-training."""
    x2 = x.reshape(-1, x.shape[-1])
    h = features(params, x2)
    pv = decode(params, h)
    on = jnp.sum(x2)
    n = x2.size
    return {
        "data_mean": jnp.mean(x2),
        "decode_mean": jnp.mean(pv),
        "p_on_given_off": jnp.sum(pv * (1 - x2)) / jnp.maximum(n - on, 1.0),
        "p_on_given_on": jnp.sum(pv * x2) / jnp.maximum(on, 1.0),
    }


def layer_inputs(params: Params, x: jax.Array, layer: int) -> jax.Array:
    """Features feeding RBM ``layer`` during greedy pre-training."""
    h = x
    for lyr in params[:layer]:
        h = jax.nn.sigmoid(precision.mm(h, lyr.w) + lyr.bh)
    return h


def pretrain_loss(params: Params, key: jax.Array, x: jax.Array,
                  layer: int, k: int = 1) -> jax.Array:
    """CD-k loss of RBM ``layer`` on (stop-gradient) lower-layer features —
    the greedy layer-wise objective. Lower layers receive no gradient."""
    feats = jax.lax.stop_gradient(layer_inputs(params, x, layer))
    p = params[layer]
    return gibbs_ops.cd_loss(key, feats, p.w, p.bv, p.bh, k=k)
