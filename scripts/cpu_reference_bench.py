"""CPU-reference stand-in benchmark: the north star is ">=50x the TF-CPU
reference" (BASELINE.json:5), but the reference itself is unrunnable here
(TF1 not installed; reference mount empty — SURVEY §0). This script measures
a FAITHFUL torch-CPU re-implementation of the reference's training step
semantics at the flagship shape, as the conservative stand-in baseline:

  * RNN-RBM: LSTMCell loop over T (the TF1 ``tf.while_loop`` recurrence),
    per-step conditioned biases, CD-1 block Gibbs with Bernoulli sampling
    (graph-op granularity, like TF1 kernels), free-energy-difference loss,
    Adam. 5 tracks with the feedback context (teacher-forced).
  * RNN-NADE: same recurrence; the exact likelihood evaluated with the
    PER-DIMENSION loop the reference's TF1 graph builds (the reference has
    no parallel cumsum formulation — SURVEY C6/[K]) — D sequential matvec
    ops per (t), exactly the op granularity TF1's runtime executes.

"Conservative" because torch-CPU batched ops are at least as fast as a TF1
feed_dict session on the same core, and this script runs the whole step in
C++-backed ops with no python per-element work. Ratios against the measured
TPU rows in BASELINE.md therefore UNDERSTATE the true speedup over the
reference.

Run: python scripts/cpu_reference_bench.py [--iters 3]
"""

import argparse
import time

import torch


def _lstm_feedback_states(cells, x_tracks, ctx):
    """Per-track LSTMCell loops over T with the feedback context appended to
    the input (TF1 while_loop semantics). x_tracks: (K, B, T, D);
    ctx: (B, T, K*D). Returns u_prev per track: (K, B, T, U)."""
    k, b, t, d = x_tracks.shape
    outs = []
    for ki in range(k):
        cell = cells[ki]
        u = torch.zeros(b, cell.hidden_size)
        c = torch.zeros(b, cell.hidden_size)
        us = []
        for ti in range(t):
            us.append(u)                    # u(t-1) conditions step t
            inp = torch.cat([x_tracks[ki, :, ti], ctx[:, ti]], dim=1)
            u, c = cell(inp, (u, c))
        outs.append(torch.stack(us, dim=1))
    return torch.stack(outs)                # (K, B, T, U)


def _free_energy(v, w, bv, bh):
    # F(v) = -v.bv - sum softplus(v@W + bh); biases per (B,T)
    return (-(v * bv).sum(-1)
            - torch.nn.functional.softplus(v @ w + bh).sum(-1))


def bench_rbm(k_tracks=5, d=84, h=150, u=100, b=16, t=64, iters=3,
              seed=0):
    torch.manual_seed(seed)
    cells = [torch.nn.LSTMCell(d + k_tracks * d, u) for _ in range(k_tracks)]
    params = []
    for c in cells:
        params += list(c.parameters())
    w = [torch.randn(d, h).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    bv0 = [torch.zeros(d, requires_grad=True) for _ in range(k_tracks)]
    bh0 = [torch.zeros(h, requires_grad=True) for _ in range(k_tracks)]
    wuv = [torch.randn(u, d).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    wuh = [torch.randn(u, h).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    params += w + bv0 + bh0 + wuv + wuh
    opt = torch.optim.Adam(params, lr=1e-3)
    x = (torch.rand(k_tracks, b, t, d) < 0.06).float()
    ctx = torch.cat([torch.zeros(b, 1, k_tracks * d),
                     x.permute(1, 2, 0, 3).reshape(b, t, -1)[:, :-1]], dim=1)

    def step():
        opt.zero_grad()
        u_prev = _lstm_feedback_states(cells, x, ctx)      # (K,B,T,U)
        loss = 0.0
        for ki in range(k_tracks):
            bv = bv0[ki] + u_prev[ki] @ wuv[ki]            # (B,T,D)
            bh = bh0[ki] + u_prev[ki] @ wuh[ki]            # (B,T,H)
            v0 = x[ki]
            # CD-1 block Gibbs, sampling detached (stop_gradient)
            with torch.no_grad():
                ph = torch.sigmoid(v0 @ w[ki] + bh)
                hs = torch.bernoulli(ph)
                pv = torch.sigmoid(hs @ w[ki].T + bv)
                vk = torch.bernoulli(pv)
            loss = loss + (_free_energy(v0, w[ki], bv, bh)
                           - _free_energy(vk, w[ki], bv, bh)).mean()
        (loss / k_tracks).backward()
        opt.step()
        return float(loss.detach())

    step(); step()                                         # warm-up
    times, loss = [], None
    for _ in range(iters):
        t0 = time.time(); loss = step(); times.append(time.time() - t0)
    return min(times), b * t, loss


def bench_nade(k_tracks=5, d=84, h=150, u=100, b=16, t=64, iters=3,
               seed=0):
    torch.manual_seed(seed)
    cells = [torch.nn.LSTMCell(d + k_tracks * d, u) for _ in range(k_tracks)]
    params = []
    for c in cells:
        params += list(c.parameters())
    w = [torch.randn(d, h).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    vv = [torch.randn(d, h).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    bv0 = [torch.zeros(d, requires_grad=True) for _ in range(k_tracks)]
    bh0 = [torch.zeros(h, requires_grad=True) for _ in range(k_tracks)]
    wuv = [torch.randn(u, d).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    wuh = [torch.randn(u, h).mul_(0.01).requires_grad_() for _ in range(k_tracks)]
    params += w + vv + bv0 + bh0 + wuv + wuh
    opt = torch.optim.Adam(params, lr=1e-3)
    x = (torch.rand(k_tracks, b, t, d) < 0.06).float()
    ctx = torch.cat([torch.zeros(b, 1, k_tracks * d),
                     x.permute(1, 2, 0, 3).reshape(b, t, -1)[:, :-1]], dim=1)

    def step():
        opt.zero_grad()
        u_prev = _lstm_feedback_states(cells, x, ctx)
        loss = 0.0
        for ki in range(k_tracks):
            bv = bv0[ki] + u_prev[ki] @ wuv[ki]            # (B,T,D)
            bh = bh0[ki] + u_prev[ki] @ wuh[ki]            # (B,T,H)
            xk = x[ki].reshape(-1, d)                      # (B*T, D)
            bvf, bhf = bv.reshape(-1, d), bh.reshape(-1, h)
            # the reference's per-dimension NADE loop (TF1 graph: D
            # sequential conditional ops — no parallel-cumsum form exists
            # in the reference)
            a = bhf
            ll = 0.0
            for i in range(d):
                hi = torch.sigmoid(a)                      # (N, H)
                logit = bvf[:, i] + hi @ vv[ki][i]
                xi = xk[:, i]
                ll = ll + (xi * torch.nn.functional.logsigmoid(logit)
                           + (1 - xi)
                           * torch.nn.functional.logsigmoid(-logit))
                a = a + xi[:, None] * w[ki][i][None, :]
            loss = loss - ll.mean()
        (loss / k_tracks).backward()
        opt.step()
        return float(loss.detach())

    step(); step()
    times, loss = [], None
    for _ in range(iters):
        t0 = time.time(); loss = step(); times.append(time.time() - t0)
    return min(times), b * t, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    # the measured single-chip v5e ms/step at the same B=16 flagship shape
    # (BASELINE.md train rows — update these if those rows are re-measured)
    ap.add_argument("--tpu-rbm-ms", type=float, default=0.88)
    ap.add_argument("--tpu-nade-ms", type=float, default=1.66)
    args = ap.parse_args()
    print(f"torch {torch.__version__} threads={torch.get_num_threads()}")
    s, frames, loss = bench_rbm(iters=args.iters)
    print(f"RNN-RBM  CD-1 flagship (5-track feedback B=16 T=64): "
          f"{s*1e3:8.1f} ms/step  ({frames/s:7.0f} frames/s, loss {loss:.3f})")
    s_n, frames, loss_n = bench_nade(iters=args.iters)
    print(f"RNN-NADE exact-LL flagship (per-dim reference loop):  "
          f"{s_n*1e3:8.1f} ms/step  ({frames/s_n:7.0f} frames/s, "
          f"loss {loss_n:.3f})")
    print(f"vs BASELINE.md v5e rows at equal B=16: RBM {args.tpu_rbm_ms} "
          f"ms/step, NADE (grid-free kernel) {args.tpu_nade_ms} ms/step")
    print(f"ratios: RBM {s*1e3/args.tpu_rbm_ms:.0f}x, "
          f"NADE {s_n*1e3/args.tpu_nade_ms:.0f}x")


if __name__ == "__main__":
    main()
