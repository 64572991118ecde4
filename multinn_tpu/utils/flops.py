"""Closed-form FLOP counts + roofline constants (SURVEY §6 metric axes).

XLA's ``compiled.cost_analysis()`` counts a ``while``/``scan`` BODY once
(verified on this backend), so any honest utilization number for scanned
programs needs closed-form counts. The counters here mirror the actual
compute paths (models/rnn_rbm.py, models/rnn_nade.py, ops/gen_fused.py) at
matmul granularity; elementwise/transcendental work is included only where it
is a non-trivial fraction (NADE's D·H activation grid). Convention: one
multiply-accumulate = 2 FLOPs.

Two FLOP notions are reported by bench.py:

  * MODEL flops — the mathematically necessary work (MFU convention).
  * EXECUTED flops — what the hardware actually multiplies. They differ in
    the fused generation kernels, whose per-track block-diagonal layouts run
    K× dense matmuls with K-1 zero blocks (a deliberate trade: one big MXU op
    beats K small dispatches at these sizes); executed = K × model there.

Peak numbers: TPU v5e (v5 lite) — 197 TFLOP/s bf16 (MXU; f32 matmuls run as
bf16 multiplies with f32 accumulation at the same rate under JAX's default
precision), ~819 GB/s HBM. Ridge arithmetic intensity = PEAK/BW ≈ 240
FLOP/byte: programs below it are bandwidth-bound at best, and programs whose
per-op shapes are far smaller than the 128×128 MXU tile are latency-bound
regardless (the generation scans here).
"""

from __future__ import annotations

V5E_PEAK_FLOPS = 197e12          # bf16 MXU peak, one v5e chip
V5E_HBM_BYTES_PER_S = 819e9


def _dims(cfg):
    """(K, D, H, U, ctx) as the compute paths see them: ``joint`` mode is ONE
    decoder over the concatenated tracks (matching gen_fused._eff_dims), and
    D is the decoder FEATURE width (DBN-encoder latent, not raw pitches)."""
    k = 1 if cfg.mode == "joint" else cfg.n_tracks
    d = cfg.feature_dim()
    h, u = cfg.n_hidden, cfg.n_rnn
    return k, d, h, u, cfg.ctx_dim()


def _gate_mult(cfg) -> int:
    """Recurrent gate width multiple: LSTM computes 4U gate pre-activations
    per step, a vanilla tanh cell computes U."""
    return 4 if cfg.cell == "lstm" else 1


def lstm_frame_flops(xin: int, u: int, layers: int = 1,
                     gate_mult: int = 4) -> int:
    """One recurrent-cell step, one batch row: z = x@wx + h@wh, gate width
    ``gate_mult``*U (4 for LSTM + ~12U elementwise, 1 for vanilla tanh)."""
    elementwise = 12 * u if gate_mult == 4 else u
    total = 0
    for layer in range(layers):
        inp = xin if layer == 0 else u
        total += 2 * (inp + u) * gate_mult * u + elementwise
    return total


def train_step_flops(cfg, batch: int, t: int) -> int:
    """MODEL flops of ONE optimizer step (fwd + bwd) of the trainer's hot
    path (``detailed=False`` loss), all K tracks. Counting: backward costs
    2x the differentiable forward; CD's Gibbs chain is under stop_gradient
    so it is forward-only (SURVEY hard part #2)."""
    k, d, h, u, ctx = _dims(cfg)
    lstm = lstm_frame_flops(d + ctx, u, cfg.rnn_layers, _gate_mult(cfg))
    biases = 2 * u * (d + h)
    if cfg.decoder_type == "rnn-rbm":
        fe2 = 2 * (2 * d * h)                  # free energy at v0 and vk
        chain = 4 * d * h * cfg.cd_k           # fwd-only (stop_gradient)
        per_frame_track = 3 * (lstm + biases + fe2) + chain
    else:                                      # rnn-nade exact LL
        # v_i*W_i products + exclusive cumsum + sigma(a) grid + V_i.h_i dots
        nade = 6 * d * h
        per_frame_track = 3 * (lstm + biases + nade)
    return batch * t * k * per_frame_track


def gen_step_flops_rbm(cfg, batch: int, gen_k: int = None) -> dict:
    """One generated frame via the fused RBM kernel (ops/gen_fused.py).
    Returns {"model": ..., "executed": ...} — executed counts the dense
    block-diagonal matmuls (K x model on the Gibbs/bias/ctx terms)."""
    k, d, h, u, ctx = _dims(cfg)
    gm = _gate_mult(cfg)
    gk = cfg.gen_k if gen_k is None else gen_k
    gibbs = 4 * d * h * gk                     # per track
    biases = 2 * u * (d + h)
    lstm = lstm_frame_flops(d + ctx, u, cfg.rnn_layers, gm)
    model = batch * k * (gibbs + biases + lstm)
    # executed: the Gibbs/bias matmuls run dense over (KD x KH) block-diag
    # layouts (K x model work); the own-v LSTM projection is compact (no
    # padding); the feedback ctx projection (KD -> K*gmU) is genuinely dense
    # in the model itself, so executed = model for it.
    ctx_dense = 2 * ctx * k * gm * u
    executed = batch * (k * k * (gibbs + biases)
                        + k * lstm_frame_flops(d, u, cfg.rnn_layers, gm)
                        + ctx_dense)
    return {"model": model, "executed": executed}


def gen_step_flops_nade(cfg, batch: int, spec: int = None) -> dict:
    """One generated frame via the fused NADE kernel: D serial dims, each a
    (KP,KHp) logit dot + a (KP, KHp+K4U) accumulation dot (KP=8 padded
    rows; executed counts the pads and the dense K-blocks). The speculative
    sweep (``spec`` branches per round, default = the kernel's auto choice)
    widens the EXECUTED logit dots and sigmoid grids 2^(spec-1)-fold —
    deliberately trading idle MXU/VPU width for a shorter serial chain; the
    MODEL count is unchanged."""
    k, d, h, u, ctx = _dims(cfg)
    gm = _gate_mult(cfg)
    kp, khp = 8, ((k * h + 127) // 128) * 128
    if spec is None:
        # the kernel's own resolution (honors the MULTINN_NADE_SPEC knob —
        # counted FLOPs must match the program that actually runs)
        from multinn_tpu.ops.gen_fused_nade import _resolve_spec
        spec = _resolve_spec(d)
    branches = 2 ** (spec - 1)                       # branch sets per round
    lstm = lstm_frame_flops(d + ctx, u, cfg.rnn_layers, gm)
    model = batch * k * (6 * d * h + 2 * d * gm * u + lstm)
    executed = batch * (d * (2 * kp * khp * branches  # speculative logit dots
                             + 2 * kp * (khp + k * gm * u)  # fused acc dots
                             + khp * branches // spec)  # branch sigmoid grids
                        + k * lstm + 2 * k * d * k * gm * u)  # ctx proj
    return {"model": model, "executed": executed}


def mfu(flops: float, seconds: float, peak: float = V5E_PEAK_FLOPS) -> float:
    """Fraction of one-chip peak achieved: flops / (seconds * peak)."""
    return flops / (seconds * peak) if seconds > 0 else 0.0
