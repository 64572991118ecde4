"""Recurrent cells and time-major scan runners (the RNN underlying SURVEY
C7/C8; the reference's MultINN uses LSTM cells in place of the paper's vanilla
RNN — we provide both).

TPU-first: recurrences are ``jax.lax.scan`` over the leading (time) axis with
inputs shaped (T, B, ...). The input projection x @ Wx for ALL timesteps is
hoisted out of the scan into one big (T·B, in) × (in, 4H) MXU matmul; only the
hidden-to-hidden matmul stays inside the scan body. ``stacked`` cells support
multi-layer RNNs; ``jax.checkpoint`` can wrap the scan body upstream for long
windows (SURVEY §5.7).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from flax import struct

from multinn_tpu.ops import precision


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------

@struct.dataclass
class LSTMParams:
    """wx: (in, 4H); wh: (H, 4H); b: (4H,). Gate order: i, f, g, o."""

    wx: jax.Array
    wh: jax.Array
    b: jax.Array

    @property
    def n_hidden(self) -> int:
        return self.wh.shape[0]


@struct.dataclass
class LSTMState:
    h: jax.Array
    c: jax.Array


def lstm_init(key: jax.Array, n_in: int, n_hidden: int,
              w_std: float = 0.01, forget_bias: float = 1.0,
              dtype=jnp.float32) -> LSTMParams:
    kx, kh = jax.random.split(key)
    b = jnp.zeros((4 * n_hidden,), dtype)
    # forget-gate bias init to 1 (standard trick; gate order i,f,g,o)
    b = b.at[n_hidden:2 * n_hidden].set(forget_bias)
    return LSTMParams(
        wx=w_std * jax.random.normal(kx, (n_in, 4 * n_hidden), dtype=dtype),
        wh=w_std * jax.random.normal(kh, (n_hidden, 4 * n_hidden), dtype=dtype),
        b=b,
    )


def lstm_zero_state(batch_shape: Tuple[int, ...], n_hidden: int,
                    dtype=jnp.float32) -> LSTMState:
    z = jnp.zeros((*batch_shape, n_hidden), dtype)
    return LSTMState(h=z, c=z)


def _lstm_gates(c, z):
    h_dim = c.shape[-1]
    i, f, g, o = (z[..., :h_dim], z[..., h_dim:2 * h_dim],
                  z[..., 2 * h_dim:3 * h_dim], z[..., 3 * h_dim:])
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return LSTMState(h=h_new, c=c_new)


def lstm_step(params: LSTMParams, state: LSTMState, x: jax.Array) -> LSTMState:
    """One LSTM step. x: (..., in)."""
    z = (precision.mm(x, params.wx) + precision.mm(state.h, params.wh)
         + params.b)
    return _lstm_gates(state.c, z)


def lstm_step_premixed(params: LSTMParams, state: LSTMState,
                       xz: jax.Array) -> LSTMState:
    """Step where the input projection x@wx+b was precomputed (scan hot path)."""
    z = xz + precision.mm(state.h, params.wh)
    return _lstm_gates(state.c, z)


# Scan unroll for the training recurrences, chosen by batch width. At small
# batch the per-step work (one small batched matmul + gates) is
# issue-latency-bound, and unrolling 8 steps per loop iteration cuts loop
# overhead / lets XLA overlap VPU work across iterations (measured on v5e,
# flagship feedback RNN-RBM full train step: B=16 1.27→1.07 ms, −16%). At
# large batch the step is bandwidth-bound and unrolling HURTS (B=64 −4%,
# B=256 −21%) — so unroll only below the measured crossover. Semantics are
# unchanged either way (lax.scan unroll).
_UNROLL = 8
_UNROLL_MAX_BATCH = 32


def _unroll_for(xz: jax.Array) -> int:
    batch = 1
    for s in xz.shape[1:-1]:
        batch *= s
    return _UNROLL if batch <= _UNROLL_MAX_BATCH else 1


def lstm_scan(params: LSTMParams, state: LSTMState,
              xs: jax.Array) -> Tuple[LSTMState, jax.Array]:
    """Run the LSTM over time-major xs (T, B, in).

    Returns (final_state, hs) with hs (T, B, H). The x-projection for all T
    steps is one MXU matmul outside the scan.
    """
    xz = precision.mm(xs, params.wx) + params.b   # (T, B, 4H) — hoisted

    def body(st, xz_t):
        st = lstm_step_premixed(params, st, xz_t)
        return st, st.h

    return jax.lax.scan(body, state, xz, unroll=_unroll_for(xz))


# ---------------------------------------------------------------------------
# Vanilla RNN (the paper's original u(t) = tanh(bu + Wuu u(t-1) + Wvu v(t)))
# ---------------------------------------------------------------------------

@struct.dataclass
class VanillaRNNParams:
    wx: jax.Array   # (in, H)
    wh: jax.Array   # (H, H)
    b: jax.Array    # (H,)

    @property
    def n_hidden(self) -> int:
        return self.wh.shape[0]


@struct.dataclass
class VanillaRNNState:
    h: jax.Array


def vanilla_init(key: jax.Array, n_in: int, n_hidden: int,
                 w_std: float = 0.01, dtype=jnp.float32) -> VanillaRNNParams:
    kx, kh = jax.random.split(key)
    return VanillaRNNParams(
        wx=w_std * jax.random.normal(kx, (n_in, n_hidden), dtype=dtype),
        wh=w_std * jax.random.normal(kh, (n_hidden, n_hidden), dtype=dtype),
        b=jnp.zeros((n_hidden,), dtype),
    )


def vanilla_zero_state(batch_shape, n_hidden, dtype=jnp.float32):
    return VanillaRNNState(h=jnp.zeros((*batch_shape, n_hidden), dtype))


def vanilla_step(params: VanillaRNNParams, state: VanillaRNNState,
                 x: jax.Array) -> VanillaRNNState:
    return VanillaRNNState(h=jnp.tanh(
        precision.mm(x, params.wx) + precision.mm(state.h, params.wh)
        + params.b))


def vanilla_scan(params, state, xs):
    xz = precision.mm(xs, params.wx) + params.b

    def body(st, xz_t):
        st = VanillaRNNState(h=jnp.tanh(xz_t + precision.mm(st.h, params.wh)))
        return st, st.h

    return jax.lax.scan(body, state, xz, unroll=_unroll_for(xz))


# ---------------------------------------------------------------------------
# Stacked (multi-layer) cells: params/state = tuple of per-layer pytrees.
# Layer l+1 consumes layer l's hidden trajectory; each layer is its own
# time-major scan (XLA pipelines the layer loops).
# ---------------------------------------------------------------------------

def stacked_init(cell_type: str, key, n_in: int, n_hidden: int,
                 n_layers: int, **kw):
    keys = jax.random.split(key, n_layers)
    sizes = [n_in] + [n_hidden] * (n_layers - 1)
    init = CELLS[cell_type][0]
    return tuple(init(keys[i], sizes[i], n_hidden, **kw)
                 for i in range(n_layers))


def stacked_zero_state(cell_type: str, batch_shape, n_hidden: int,
                       n_layers: int, dtype=jnp.float32):
    zero = CELLS[cell_type][1]
    return tuple(zero(batch_shape, n_hidden, dtype) for _ in range(n_layers))


def stacked_step(cell_type: str, params, states, x):
    step = CELLS[cell_type][2]
    new_states = []
    inp = x
    for p, st in zip(params, states):
        st = step(p, st, inp)
        new_states.append(st)
        inp = st.h
    return tuple(new_states)


def stacked_scan(cell_type: str, params, states, xs,
                 remat: bool = False):
    """Run all layers over time-major xs. ``remat=True`` wraps each layer's
    scan body in jax.checkpoint: backward recomputes the step instead of
    storing per-step residuals — O(T) activation memory becomes O(T) carries
    only (SURVEY §5.7's long-window lever)."""
    scan = CELLS[cell_type][3]
    finals = []
    inp = xs
    for p, st in zip(params, states):
        if remat:
            final, hs = _remat_cell_scan(cell_type, p, st, inp)
        else:
            final, hs = scan(p, st, inp)
        finals.append(final)
        inp = hs
    return tuple(finals), inp


def _remat_cell_scan(cell_type: str, params, state, xs):
    step = CELLS[cell_type][2]

    @jax.checkpoint
    def body(st, x_t):
        st = step(params, st, x_t)
        return st, st.h

    return jax.lax.scan(body, state, xs, unroll=_unroll_for(xs))


# ---------------------------------------------------------------------------
# Generic cell dispatch (used by decoders; 'lstm' is the MultINN default)
# ---------------------------------------------------------------------------

CELLS = {
    "lstm": (lstm_init, lstm_zero_state, lstm_step, lstm_scan),
    "vanilla": (vanilla_init, vanilla_zero_state, vanilla_step, vanilla_scan),
}


def cell_init(cell_type: str, key, n_in, n_hidden, **kw):
    return CELLS[cell_type][0](key, n_in, n_hidden, **kw)


def cell_zero_state(cell_type: str, batch_shape, n_hidden, dtype=jnp.float32):
    return CELLS[cell_type][1](batch_shape, n_hidden, dtype)


def cell_step(cell_type: str, params, state, x):
    return CELLS[cell_type][2](params, state, x)


def cell_scan(cell_type: str, params, state, xs):
    return CELLS[cell_type][3](params, state, xs)


def state_h(state) -> jax.Array:
    """Uniform accessor for the exposed hidden vector of any cell state."""
    return state.h
