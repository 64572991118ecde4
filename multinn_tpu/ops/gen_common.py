"""Shared layout/gate helpers for the whole-generation fused kernels
(gen_fused_rbm.py / gen_fused_nade.py; facade: gen_fused.py).

Both kernels run in the decoder's FEATURE space with per-track block rows;
the helpers here are the pieces of that contract the two kernel families
share — effective (K, D) resolution (joint mode collapses to one wide
track), ShapeDtypeStruct param builders for the VMEM gates, and the
single-decoder -> track-stacked adapter.
"""

from __future__ import annotations

import jax


def _decoder_param_shapes(cfg, decoder_mod):
    """Track-stacked decoder Params as a ShapeDtypeStruct pytree — lets the
    VMEM gates run the real arg builders without materializing arrays.
    ``joint`` mode's single decoder is stacked as one track (see _eff_dims)."""
    dcfg = cfg.decoder_config()
    if cfg.mode == "joint":
        return jax.eval_shape(
            lambda k: _stack_joint(decoder_mod.init(k, dcfg)),
            jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(0), cfg.n_tracks)
    return jax.eval_shape(
        lambda ks: jax.vmap(lambda k: decoder_mod.init(k, dcfg))(ks), keys)


def _common_gate(cfg, decoder_type: str) -> bool:
    # DBN encoders are FREE for the kernels: the whole generation loop runs
    # in latent space (decoder dims = feature_dim, feedback ctx = latents),
    # so the dispatch decodes the latent roll to pianoroll in XLA AFTER the
    # kernel (models/multinn._generate_fused). Both cell families (LSTM and
    # the paper's vanilla tanh RNN) are in-kernel — nothing gates on cell.
    return cfg.decoder_type == decoder_type


def _eff_dims(cfg):
    """(K, D) as the KERNELS see them: the kernels run in the decoder's
    FEATURE space (pianoroll pitches for pass-through encoders, the DBN
    latent width otherwise — the latent roll decodes to pianoroll in XLA
    after the kernel). ``joint`` mode is a single decoder over the
    concatenated tracks — ONE track of the joint feature width (the block
    layouts collapse to plain dense matrices). Together the kernels cover
    every inter-track architecture and encoder."""
    if cfg.mode == "joint":
        return 1, cfg.feature_dim()
    return cfg.n_tracks, cfg.feature_dim()


def _stack_joint(tree):
    """Single-decoder params/state -> 1-track stacked (leading axis)."""
    return jax.tree.map(lambda a: a[None], tree)

